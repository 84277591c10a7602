"""Artifact I/O: iden3 binfile container, .zkey and .wtns formats."""

from .binfile import BinFile, write_binfile  # noqa: F401
from .zkey import ZKey, read_zkey, write_zkey  # noqa: F401
from .wtns import read_wtns, write_wtns  # noqa: F401
