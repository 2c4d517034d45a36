from arnab_spark.cli import main

raise SystemExit(main())
