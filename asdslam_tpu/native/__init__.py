"""Native (C++) runtime components, loaded via ctypes with pure-Python
fallbacks.  Build once with `python -m asdslam_tpu.native.build`."""

from asdslam_tpu.native.loader import decode_png_gray, native_available  # noqa: F401
