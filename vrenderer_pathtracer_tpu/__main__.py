from vrenderer_pathtracer_tpu.cli import main

raise SystemExit(main())
