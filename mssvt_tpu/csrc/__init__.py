"""Native (C++) host-runtime components, loaded via ctypes.

Build with ``python -m mssvt_tpu.csrc.build`` (done automatically on first
use; falls back to the pure-numpy implementations if no compiler is
available).
"""

from .build import load_library

__all__ = ["load_library"]
