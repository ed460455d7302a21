from falcon_tpu.utils.natsort import natsorted, natsort_key


def test_natsort_numeric_order():
    values = ["scan10", "scan2", "scan1", "scan2b", "scan2a"]
    assert natsorted(values) == [
        "scan1", "scan2", "scan2a", "scan2b", "scan10"
    ]


def test_natsort_mixed_text():
    assert natsorted(["b1", "a10", "a2"]) == ["a2", "a10", "b1"]


def test_natsort_key_tuple_pairs():
    values = [("f2.mgf", "scan10"), ("f2.mgf", "scan9"), ("f10.mgf", "s1")]
    ordered = sorted(values, key=lambda t: tuple(map(natsort_key, t)))
    assert ordered == [
        ("f2.mgf", "scan9"), ("f2.mgf", "scan10"), ("f10.mgf", "s1")
    ]


def test_native_natsort_pairs_matches_python():
    import numpy as np
    import pytest

    from falcon_tpu import native
    from falcon_tpu.utils.natsort import natsort_key

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    primary = [
        "b.mgf", "a10.mgf", "a2.mgf", "a2.mgf", "a02.mgf", "a.mgf",
        "file_007", "file_7", "file_07x", "z", "",
    ]
    secondary = [
        "scan10", "scan2", "scan10", "scan2", "scan3", "x1y", "x1z",
        "x01y", "s", "s", "t",
    ]
    got = native.natsort_pairs(primary, secondary)
    want = sorted(
        range(len(primary)),
        key=lambda i: (natsort_key(primary[i]),
                       natsort_key(secondary[i])),
    )
    assert list(got) == want


def test_native_natsort_pairs_random_parity():
    import random

    import pytest

    from falcon_tpu import native
    from falcon_tpu.utils.natsort import natsort_key

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = random.Random(0)
    alphabet = "abc019_."
    strings = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        for _ in range(500)
    ]
    primary = [rng.choice(strings) for _ in range(500)]
    secondary = [rng.choice(strings) for _ in range(500)]
    got = native.natsort_pairs(primary, secondary)
    want = sorted(
        range(500),
        key=lambda i: (natsort_key(primary[i]),
                       natsort_key(secondary[i])),
    )
    assert list(got) == want


def test_device_put_chunked_roundtrip():
    import numpy as np

    from falcon_tpu.ops.xfer import device_put_chunked

    rng = np.random.default_rng(0)
    a = rng.normal(size=(1000, 700)).astype(np.float32)  # 2.8 MB
    d = device_put_chunked(a, max_bytes=2**20)  # force 3 slabs
    np.testing.assert_array_equal(np.asarray(d), a)
    small = rng.normal(size=(4, 4)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(device_put_chunked(small)), small
    )
