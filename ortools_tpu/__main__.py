from ortools_tpu.cli import main

raise SystemExit(main())
