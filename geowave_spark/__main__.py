"""``python -m geowave_spark`` — the CLI entry point (see cli.py)."""

from geowave_spark.cli import main

raise SystemExit(main())
