"""Run reproducibility: snapshot the framework source into the run dir.

The reference copies its code tree next to each run's outputs
(``saveRuntimeCode``, /root/reference/train.py:1053-1064 via
utils/system_utils.py) so results stay attributable to an exact code
state.  Here the snapshot is a single zip (sources are small) plus the
current git HEAD if available.
"""
from __future__ import annotations

import os
import subprocess
import zipfile


def save_runtime_code(out_dir: str) -> str:
    """Zip every tracked .py/.md source under the repo into
    ``out_dir/code_snapshot.zip``; returns the zip path."""
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.makedirs(out_dir, exist_ok=True)
    dst = os.path.join(out_dir, "code_snapshot.zip")
    with zipfile.ZipFile(dst, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(repo):
            dirs[:] = [d for d in dirs
                       if d not in (".git", "data", "output", "__pycache__",
                                    "log_training", ".pytest_cache")]
            for f in files:
                if f.endswith((".py", ".md")):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, repo))
        try:
            head = subprocess.run(
                ["git", "-C", repo, "rev-parse", "HEAD"],
                capture_output=True, text=True, timeout=10).stdout.strip()
            z.writestr("GIT_HEAD", head + "\n")
        except Exception:
            pass
    return dst
