"""Chunk-grid golden + property tests (reference parity: predict.py:38-96)."""
import numpy as np
import pytest

from iterseg_tpu.core.chunks import (
    make_chunks,
    process_chunks,
    get_slices_from_chunks,
    chunk_slices,
)


def test_make_chunks_default_config():
    # the reference default work unit: 256^3 volume, chunk (10,256,256),
    # margin (1,64,64) -> 32 z-chunks, single y/x chunk
    starts, crops = make_chunks((256, 256, 256), (10, 256, 256), (1, 64, 64))
    assert len(starts) == 32
    zs = sorted({s[0] for s in starts})
    assert zs[0] == 0 and zs[-1] == 246
    assert all(s[1] == 0 and s[2] == 0 for s in starts)
    # y/x crops of a single chunk cover the whole axis
    assert all(
        tuple(c[1]) == (0, 256) and tuple(c[2]) == (0, 256) for c in crops
    )


def test_make_chunks_single_chunk_exact_fit():
    starts, crops = make_chunks((10, 64, 64), (10, 64, 64), (1, 8, 8))
    assert [tuple(s) for s in starts] == [(0, 0, 0)]
    assert [tuple(tuple(c) for c in cs) for cs in crops] == [
        ((0, 10), (0, 64), (0, 64))
    ]


@pytest.mark.parametrize(
    "arr,chk,mrg",
    [
        ((37,), (10,), (2,)),
        ((100,), (10,), (1,)),
        ((64, 80), (16, 32), (2, 4)),
        ((23, 50, 41), (10, 20, 16), (1, 4, 3)),
        ((256, 256, 256), (10, 256, 256), (1, 64, 64)),
        ((33, 512, 512), (10, 256, 256), (1, 64, 64)),
    ],
)
def test_crops_tile_exactly(arr, chk, mrg):
    """Every voxel must be written exactly once by the crop grid."""
    starts, crops = make_chunks(arr, chk, mrg)
    cover = np.zeros(arr, dtype=int)
    for start, crop in zip(starts, crops):
        sl = chunk_slices(start, chk)
        region = np.zeros(chk, dtype=int)
        region[tuple(slice(i, j) for i, j in crop)] = 1
        cover[sl] += region
    assert cover.min() == 1 and cover.max() == 1


def test_process_chunks_identity_blend():
    """Passing the identity through the chunk grid reconstructs the input."""
    rng = np.random.default_rng(0)
    vol = rng.random((23, 40, 37)).astype(np.float32)
    out = np.zeros((1,) + vol.shape, dtype=np.float32)

    def f(input_volume, sl):
        # mimic a model returning (1, C, z, y, x)
        return input_volume[sl[1:]][None, None]

    process_chunks(vol, (10, 16, 16), out, (1, 4, 4), f)
    np.testing.assert_array_equal(out[0], vol)


def test_get_slices_from_chunks_4d():
    slices = get_slices_from_chunks((3, 20, 32, 32), (10, 16, 16), (1, 4, 4))
    labels = np.arange(3 * 20 * 32 * 32).reshape(3, 20, 32, 32)
    seen = np.zeros_like(labels)
    for sl, cr in slices:
        chunk = np.squeeze(labels[sl])[cr]
        # accumulate coverage
        base = np.zeros_like(labels[sl])
        sq = np.zeros(np.squeeze(labels[sl]).shape, dtype=int)
        sq[cr] = 1
        seen[sl] += sq.reshape(base.shape)
    assert seen.min() == 1 and seen.max() == 1
