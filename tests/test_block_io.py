"""Native async block IO (io_uring loader + thread-pool fallback) and
its integration into the plaintext manager's prefetch path."""

import numpy as np
import pytest

from ace_tpu.runtime.block_io import AsyncBlockLoader
from ace_tpu.runtime.rt_data import RtDataWriter, RtDataReader, PtManager


@pytest.fixture
def data_file(tmp_path):
    w = RtDataWriter()
    rng = np.random.default_rng(3)
    blobs = {f"w{i}": rng.standard_normal(100 + 7 * i).astype(np.float32)
             for i in range(5)}
    for name, arr in blobs.items():
        w.append(name, arr)
    path = str(tmp_path / "weights.bin")
    w.write(path)
    return path, blobs


def test_async_loader_roundtrip(data_file):
    path, blobs = data_file
    rd = RtDataReader(path)
    aio = AsyncBlockLoader(path)
    # overlapped out-of-order submit/wait
    toks = {}
    for name in blobs:
        ent = rd.entries[rd.by_name[name]]
        toks[name] = (aio.submit(ent["offset"], ent["nbytes"]), ent)
    for name in reversed(list(blobs)):
        tok, ent = toks[name]
        raw = aio.wait(tok).view(np.float32)
        assert np.array_equal(raw, blobs[name]), name
    assert aio.engine in ("io_uring", "threadpool")
    aio.close()
    rd.close()


def test_pt_manager_prefetch_uses_async(data_file):
    path, blobs = data_file

    class FakeEncoder:
        class params:
            slots = 256

        def encode(self, msg, level=0, sf_degree=1):
            return np.asarray(msg)

    mgr = PtManager(RtDataReader(path), FakeEncoder(), path=path)
    for name in blobs:
        mgr.prefetch(name)
    for name, arr in blobs.items():
        pt = mgr.get(name, level=3)
        assert np.allclose(pt[:arr.size].real, arr, atol=1e-6)
    assert not mgr._pending


def test_short_read_raises(data_file):
    path, _ = data_file
    aio = AsyncBlockLoader(path)
    import os
    size = os.path.getsize(path)
    tok = aio.submit(size - 10, 100)  # runs past EOF
    with pytest.raises(OSError):
        aio.wait(tok)
    aio.close()
