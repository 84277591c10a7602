"""Native C++ binfile loader parity with the pure-Python reader."""

import os

import numpy as np
import pytest

from rapidsnark_tpu.io import native as N
from rapidsnark_tpu.io.binfile import BinFile, write_binfile

from conftest import FIXTURES

pytestmark = pytest.mark.skipif(
    N.load_library() is None, reason="native loader unavailable")


def test_native_matches_python_on_fixture():
    path = os.path.join(FIXTURES, "sqchain64.zkey")
    py = BinFile(path, "zkey", 1)
    nat = N.NativeBinFile(path, "zkey", 1)
    try:
        assert nat.version == py.version
        assert nat.sections == py.sections
        for sec, entries in py.sections.items():
            for pos in range(len(entries)):
                a = np.asarray(py.section_u8(sec, pos)).copy()
                b = nat.section_u8(sec, pos).copy()
                assert np.array_equal(a, b)
    finally:
        py.close()
        nat.close()


def test_native_error_messages(tmp_path):
    path = str(tmp_path / "x.bin")
    write_binfile(path, "test", 7, [(1, b"hello")])
    with pytest.raises(ValueError, match="Invalid file type"):
        N.NativeBinFile(path, "zkey", 9)
    with pytest.raises(ValueError, match="Invalid version"):
        N.NativeBinFile(path, "test", 3)
    with pytest.raises(ValueError, match="cannot open"):
        N.NativeBinFile(str(tmp_path / "missing.bin"), "test", 9)


def test_native_truncated_section(tmp_path):
    import struct
    path = str(tmp_path / "bad.bin")
    with open(path, "wb") as f:
        f.write(b"test" + struct.pack("<II", 1, 1))
        f.write(struct.pack("<IQ", 1, 1 << 40))  # size overruns the file
    with pytest.raises(ValueError, match="overruns"):
        N.NativeBinFile(path, "test", 9)


def test_zkey_reader_uses_backend_transparently():
    from rapidsnark_tpu.io.zkey import read_zkey
    zk = read_zkey(os.path.join(FIXTURES, "multiplier.zkey"))
    assert zk.n_vars == 4
