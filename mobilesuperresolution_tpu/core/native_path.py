"""Locate the built native cores (native/*.so) across install layouts.

Search order:

1. ``$MSR_NATIVE_DIR`` — explicit override (wheel installs, system packages);
2. ``<repo>/native/`` next to the package — the source-checkout / editable-
   install layout, where ``make -C native`` puts the libraries;
3. ``mobilesuperresolution_tpu/_native/`` inside the package — for
   distributions that copy the built libraries into the package tree.

Every native entry point keeps a pure-Python fallback, so a missing library
degrades performance, never correctness.
"""

import os

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def find_native_lib(name):
    """Return the path to ``name`` (e.g. ``libloader.so``) or None."""
    env = os.environ.get("MSR_NATIVE_DIR")
    candidates = []
    if env:
        candidates.append(os.path.join(env, name))
    candidates.append(os.path.join(os.path.dirname(_PKG_DIR), "native", name))
    candidates.append(os.path.join(_PKG_DIR, "_native", name))
    for path in candidates:
        if os.path.exists(path):
            return path
    return None
