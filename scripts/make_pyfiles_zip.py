#!/usr/bin/env python
"""Build the --py-files archive for spark-submit deployment.

    python scripts/make_pyfiles_zip.py [/tmp/ups.zip]
    spark-submit --master <cluster> --py-files /tmp/ups.zip \
        scripts/run_pipeline.py <workdir> [sf_dir]

The zip carries the `urbanistic_polygons_spark` package only (the
entrypoint script is passed to spark-submit directly); verified
end-to-end from an isolated cwd so every import resolves from the
archive, not the repo checkout — identical stage row counts either way
(README "Deployment").
"""
import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ups.zip"
    pkg = os.path.join(ROOT, "urbanistic_polygons_spark")
    with zipfile.ZipFile(out, "w") as z:
        for dp, _dns, fns in os.walk(pkg):
            if "__pycache__" in dp:
                continue
            for fn in sorted(fns):
                if fn.endswith(".py"):
                    full = os.path.join(dp, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    n = len(zipfile.ZipFile(out).namelist())
    print(f"{out}: {n} modules")


if __name__ == "__main__":
    main()
