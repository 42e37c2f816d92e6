"""Sources & sinks: file formats, readers, writers/load modes, catalog,
filesystem utilities."""
