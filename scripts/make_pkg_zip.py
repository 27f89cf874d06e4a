"""Build the --py-files zip of the engine package."""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make(path: str = "/tmp/riw_pkg.zip") -> str:
    with zipfile.ZipFile(path, "w") as z:
        pkg = os.path.join(REPO, "rechercheinfoweb_spark")
        for root, _, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/riw_pkg.zip"
    print(make(out))
