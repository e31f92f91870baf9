from polars_mas_spark.cli import main

raise SystemExit(main())
