"""Shared bootstrap for the tools/ scripts: puts the repo root on sys.path
(so `import tmar` works when a script is run as `python tools/foo.py`) and
points jax at the persistent compilation cache under .jax_cache/.

Usage (first import in every tools/ script):  ``import _path  # noqa: F401``
— running `python tools/<script>.py` puts tools/ itself on sys.path[0], so
this resolves without tools/ being a package.
"""
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
