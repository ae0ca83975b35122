"""Run-reproducibility metadata.

The reference's only record of how a run was configured is the hand-edited
hyperparameter block at the top of each driver script plus an arch-encoded
output filename (conv_cINN.py:22-141, :519; SURVEY.md §5 "Config / flag
system: none").  Here every driver writes ``run.json`` into its output
directory: the exact CLI arguments, the backend it ran on, the package
version and (when available) the git commit — enough to re-launch the run
bit-for-bit or audit an old artifact.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _git_commit() -> str | None:
    try:
        out = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            capture_output=True, timeout=5, text=True,
        )
        return out.stdout.strip() or None if out.returncode == 0 else None
    except Exception:
        return None


def write_run_metadata(outdir: str, args, extra: dict | None = None) -> str:
    """Write ``<outdir>/run.json`` describing this invocation.

    Args:
        args: the parsed argparse namespace (anything with ``vars()``).
        extra: additional driver-specific fields (e.g. derived arch string).
    Returns the path written.
    """
    meta = {
        "argv": sys.argv,
        "args": {k: v for k, v in sorted(vars(args).items())},
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "python": sys.version.split()[0],
        "git_commit": _git_commit(),
    }
    try:
        import jax

        meta["jax_version"] = jax.__version__
        meta["backend"] = jax.devices()[0].platform
        meta["device_count"] = jax.device_count()
    except Exception:
        pass
    if extra:
        meta.update(extra)
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "run.json")
    with open(path, "w") as f:
        json.dump(meta, f, indent=2, default=str)
    return path
