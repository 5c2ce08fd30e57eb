"""package_pyfiles.py: the --py-files artifact is deterministic,
test-free, and importable straight off the zip (zipimport — exactly how
executor workers consume it)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyfiles_zip_deterministic_and_importable(tmp_path):
    z1, z2 = str(tmp_path / "a.zip"), str(tmp_path / "b.zip")
    for out in (z1, z2):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "package_pyfiles.py"),
             "--out", out],
            capture_output=True, text=True, timeout=60)
        assert r.returncode == 0, r.stderr
    assert open(z1, "rb").read() == open(z2, "rb").read()

    import zipfile
    names = zipfile.ZipFile(z1).namelist()
    assert all(n.startswith("puddsketch_spark/") for n in names)
    assert not any("test" in n or "__pycache__" in n for n in names)

    # import from the zip in a clean interpreter (no repo dir on path)
    r = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, sys.argv[1]); "
         "from puddsketch_spark.core import UDDSketch; import numpy as np; "
         "sk = UDDSketch(initial_alpha=0.01, m=0).update(np.arange(1.0, 50.0)); "
         "print(sk.count)",
         z1],
        capture_output=True, text=True, timeout=60, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "49"
