"""Native C++ runtime tests (PNG decode + prefetching loader)."""

import numpy as np
import pytest

from monocular_visual_odometry_tpu.runtime import (FrameLoader, decode_png,
                                                   native_available)


@pytest.fixture(scope="module")
def seq(tmp_path_factory):
    from monocular_visual_odometry_tpu.data import synthetic as syn
    from monocular_visual_odometry_tpu.utils import io as vio

    d = tmp_path_factory.mktemp("rtseq")
    syn.render_sequence(str(d), n_frames=6, height=120, width=160)
    return vio.image_paths(str(d), 6)


def test_decode_matches_pil(seq):
    from PIL import Image

    ref = np.asarray(Image.open(seq[0]).convert("L"), dtype=np.float32)
    img = decode_png(seq[0], 120, 160)
    np.testing.assert_array_equal(img, ref)


def test_loader_ordered_and_complete(seq):
    from PIL import Image

    with FrameLoader(seq, 120, 160, depth=2, n_threads=3) as fl:
        frames = [f.copy() for f in fl]
    assert len(frames) == 6
    for i, f in enumerate(frames):
        ref = np.asarray(Image.open(seq[i]).convert("L"), dtype=np.float32)
        np.testing.assert_array_equal(f, ref)


def test_loader_early_close(seq):
    fl = FrameLoader(seq, 120, 160, depth=2)
    it = iter(fl)
    next(it)
    fl.close()  # must not hang or crash with frames still queued


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_native_rejects_wrong_size(seq):
    import ctypes

    from monocular_visual_odometry_tpu import runtime

    lib = runtime._load_native()
    out = np.empty((50, 50), dtype=np.float32)
    rc = lib.mvo_decode_png(seq[0].encode(),
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                            50, 50)
    assert rc == -4
