from vpt_tpu.cli import main

raise SystemExit(main())
