from quickmer2_tpu.cli import main

raise SystemExit(main())
