"""Native host-side components: on-demand-compiled C++ extension.

`get_native()` compiles native/w3dnative.cpp with g++ on first use
(cached as a .so next to the source) and returns the module, or None if no
compiler is available — callers fall back to pure-Python paths.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sysconfig

_CACHED = None
_TRIED = False


def get_native():
    global _CACHED, _TRIED
    if _TRIED:
        return _CACHED
    _TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "w3dnative.cpp")
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    so = os.path.join(here, "w3dnative" + ext)
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        inc = sysconfig.get_paths()["include"]
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               f"-I{inc}", src, "-o", so]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            _CACHED = None
            return None
    spec = importlib.util.spec_from_file_location("w3dnative", so)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except ImportError:
        _CACHED = None
        return None
    _CACHED = mod
    return mod
