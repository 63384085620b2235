#!/usr/bin/env python
"""Package splade_spark for spark-submit --py-files.

    python scripts/package.py [out.zip]   # default: dist/splade_spark.zip
"""

from __future__ import annotations

import os
import sys
import zipfile


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "dist", "splade_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(repo, "splade_spark")
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, repo))
                    n += 1
    print(f"{out}: {n} files")


if __name__ == "__main__":
    main()
