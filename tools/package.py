"""Build the spark-submit artifact: dist/pipeline.zip + dist/run_job.py.

Cluster usage (BASELINE.json:14 "run via spark-submit --py-files"):

    spark-submit --master <cluster> --py-files dist/pipeline.zip \
        dist/run_job.py --input <iceberg/parquet> --output <sink root>
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIST = os.path.join(REPO, "dist")


def build() -> tuple[str, str]:
    os.makedirs(DIST, exist_ok=True)
    zip_path = os.path.join(DIST, "pipeline.zip")
    pkg = os.path.join(REPO, "stash_log_parser_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".pyc"):
                    continue
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, REPO))
    runner = os.path.join(DIST, "run_job.py")
    with open(runner, "w") as f:
        f.write(
            "from stash_log_parser_spark.plans.job import main\n\n"
            'if __name__ == "__main__":\n    main()\n'
        )
    return zip_path, runner


if __name__ == "__main__":
    z, r = build()
    print(z)
    print(r)
