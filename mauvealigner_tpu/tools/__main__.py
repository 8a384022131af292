from mauvealigner_tpu.tools.cli import main

raise SystemExit(main())
