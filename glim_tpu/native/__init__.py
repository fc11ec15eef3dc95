"""Native (C++) host runtime: scan packing + PLY IO.

Compiled on first import with g++ (cached by source mtime); every entry point
has a numpy fallback so the framework stays functional without a toolchain.
"""

from glim_tpu.native.loader import (available, pack_scan_i16, ply_read,  # noqa: F401
                                    ply_write)
