from m3d_engine_spark.cli import main

raise SystemExit(main())
