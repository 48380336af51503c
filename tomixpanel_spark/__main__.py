"""CLI entry: ``python -m tomixpanel_spark config.json`` — the engine's
equivalent of the reference's ``node index.js config.json`` (index.js:29-46:
find a .json arg, parse it, dispatch on source.name; on failure print an
example and exit).

Dry-run mode (``--dry-run``) builds the plan and prints row counts without
sending anything — there is no implicit network access (sinks need explicit
destination URLs; vendor fetchers need injected transports, so CLI runs
operate on pre-staged ``path`` inputs).
"""

from __future__ import annotations

import json
import sys

_EXAMPLE = {
    "source": {
        "name": "csv",
        "options": {
            "path": "./events.csv",
            "event_name_col": "action",
            "distinct_id_col": "guid",
            "time_col": "time",
            "insert_id_col": "insert_id",
            "ignore_cols": ["favoriteColor"],
            "create_profiles": True,
        },
    },
    "destination": {"name": "mixpanel", "token": "YOUR_TOKEN"},
}


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    dry = "--dry-run" in argv
    cfg_paths = [a for a in argv if a.endswith(".json")]
    if not cfg_paths:
        print("usage: python -m tomixpanel_spark [--dry-run] config.json", file=sys.stderr)
        print("example config:\n" + json.dumps(_EXAMPLE, indent=2), file=sys.stderr)
        return 2
    try:
        with open(cfg_paths[0]) as f:
            config = json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        print(f"could not read config {cfg_paths[0]}: {e}", file=sys.stderr)
        print("example config:\n" + json.dumps(_EXAMPLE, indent=2), file=sys.stderr)
        return 2

    from tomixpanel_spark import get_spark, pipeline

    spark = get_spark("tomixpanel_cli")
    try:
        if dry:
            plan = pipeline.build(spark, config)
            out = {
                name: df.count()
                for name, df in (
                    ("events", plan.events),
                    ("profiles", plan.profiles),
                    ("merges", plan.merges),
                )
                if df is not None
            }
            print(json.dumps({"dry_run": True, "rows": out}))
        else:
            summary = pipeline.run(spark, config)
            print(json.dumps(summary))
        return 0
    except (KeyError, ValueError) as e:
        print(f"bad config: {e}", file=sys.stderr)
        return 2
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
