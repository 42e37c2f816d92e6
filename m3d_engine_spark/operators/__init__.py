"""Dataflow operators.

Each module exposes pure ``DataFrame -> DataFrame`` transform functions
(the testable, composable core) plus, where the reference has a
dispatchable job, a config-driven Algorithm class registered with the
CLI (operators.base.REGISTRY).
"""
