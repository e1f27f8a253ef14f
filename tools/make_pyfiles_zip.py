"""Build the --py-files archive for spark-submit (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

    python tools/make_pyfiles_zip.py [out.zip]

Zips the `p2pddsketch_spark` package (source only, no caches) with
deterministic member order and timestamps, so the artifact is
reproducible byte-for-byte from a clean tree. Default output:
dist/sketchlib.zip. Prints one JSON line {"zip": path, "members": n,
"bytes": n}.
"""

from __future__ import annotations

import json
import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> dict:
    pkg = os.path.join(REPO, "p2pddsketch_spark")
    members = []
    for root, dirs, files in os.walk(pkg):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                members.append((full, os.path.relpath(full, REPO)))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in members:
            with open(full, "rb") as fh:
                data = fh.read()
            # fixed timestamp -> byte-reproducible archive
            info = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return {"zip": out_path, "members": len(members),
            "bytes": os.path.getsize(out_path)}


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "sketchlib.zip")
    print(json.dumps(build(out), sort_keys=True))
