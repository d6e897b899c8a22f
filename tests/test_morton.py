import numpy as np

from obj2voxel_tpu.ops.morton import dileave3, ileave3


def test_morton_roundtrip():
    rng = np.random.RandomState(3)
    x = rng.randint(0, 1 << 21, size=1000).astype(np.int64)
    y = rng.randint(0, 1 << 21, size=1000).astype(np.int64)
    z = rng.randint(0, 1 << 21, size=1000).astype(np.int64)
    code = ileave3(x, y, z)
    rx, ry, rz = dileave3(code)
    assert np.array_equal(rx, x)
    assert np.array_equal(ry, y)
    assert np.array_equal(rz, z)


def test_morton_ordering_small():
    # Z-order of a 2x2x2 block enumerates children contiguously
    codes = sorted(
        int(ileave3(np.int64(x), np.int64(y), np.int64(z)))
        for x in range(2) for y in range(2) for z in range(2)
    )
    assert codes == list(range(8))
