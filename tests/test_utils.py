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
