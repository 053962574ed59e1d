from ortools_tpu.flatzinc.driver import main

raise SystemExit(main())
