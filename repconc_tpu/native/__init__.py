"""Native (C++) host-side components with lazy in-tree compilation.

The reference's host-side native dependency is pytrec_eval (a C wrapper of
trec_eval). Here the equivalent is built from source on first use with the
system toolchain and cached next to the sources; everything degrades to the
pure-Python implementations when no compiler is available.
"""
from __future__ import annotations

import logging
import os
import subprocess
import sysconfig
from typing import Optional

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_DIR, "_trec_native.so")
_SRC = os.path.join(_DIR, "trec_eval.cpp")

_module = None
_tried = False


def _build() -> bool:
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        f"-I{include}", _SRC, "-o", _SO_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception as e:  # no compiler / build failure -> fallback
        logger.debug("native build failed: %s", e)
        return False


def load() -> Optional[object]:
    """Return the _trec_native module, building it if needed; None if
    unavailable."""
    global _module, _tried
    if _module is not None or _tried:
        return _module
    _tried = True
    if not os.path.exists(_SO_PATH) or (
            os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location("_trec_native", _SO_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _module = mod
    except Exception as e:
        logger.debug("native load failed: %s", e)
        _module = None
    return _module


def evaluate_files(qrel_path: str, run_path: str,
                   k_values=(1, 3, 5, 10, 100), mrr_k_values=(10, 100),
                   relevance_level: int = 1):
    """Fast path for file-level evaluation; falls back to pure Python."""
    mod = load()
    if mod is not None:
        return mod.evaluate_files(qrel_path, run_path, tuple(k_values),
                                  tuple(mrr_k_values), relevance_level)
    from repconc_tpu.eval.trec import evaluate_run

    m = evaluate_run(qrel_path, run_path, tuple(k_values),
                     tuple(mrr_k_values), relevance_level)
    m = {k: v for k, v in m.items() if k != "perquery"}
    return m
