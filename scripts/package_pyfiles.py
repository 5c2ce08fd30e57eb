"""Build puddsketch_spark.zip for spark-submit --py-files.

Every CLI in scripts/ documents `spark-submit --py-files
puddsketch_spark.zip ...`; this produces that artifact: the package
sources only (no tests, no caches, no bench data), importable by
executor Python workers on a real cluster — the multi-executor
counterpart of the local-mode PYTHONPATH export in
spark/session.get_spark.

    python scripts/package_pyfiles.py [--out puddsketch_spark.zip]

Deterministic output: members are added in sorted order with a fixed
timestamp, so the same tree produces a byte-identical zip (reproducible
deploys; CI can hash it).
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "puddsketch_spark")
# fixed timestamp: zip stores no tz; any constant date makes builds
# byte-identical across machines
_EPOCH = (2020, 1, 1, 0, 0, 0)


def build(out_path: str) -> list[str]:
    members = []
    for root, dirs, files in os.walk(PKG):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith((".pyc", ".pyo")):
                continue
            full = os.path.join(root, f)
            rel = os.path.relpath(full, REPO)
            members.append((full, rel))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for full, rel in members:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(rel, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    return [rel for _, rel in members]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="build --py-files zip")
    p.add_argument("--out", default=os.path.join(REPO, "puddsketch_spark.zip"))
    args = p.parse_args(argv)
    members = build(args.out)
    size = os.path.getsize(args.out)
    print(f"{args.out}: {len(members)} files, {size} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
