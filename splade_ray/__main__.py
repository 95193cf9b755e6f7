from splade_ray.cli import main

raise SystemExit(main())
