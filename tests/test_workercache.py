"""stages/workercache.py: worker-local instance cache semantics."""

from paper2table_ray.stages import workercache as wc


class Counting:
    instances = 0

    def __init__(self, tag="x"):
        Counting.instances += 1
        self.tag = tag

    def __call__(self, batch):
        return (self.tag, batch)


def test_one_instance_per_key():
    wc._CACHE.clear()
    Counting.instances = 0
    fn = wc.worker_cached(Counting, tag="a")
    assert fn(1) == ("a", 1)
    assert fn(2) == ("a", 2)
    assert Counting.instances == 1


def test_distinct_kwargs_distinct_instances():
    wc._CACHE.clear()
    Counting.instances = 0
    fa = wc.worker_cached(Counting, tag="a")
    fb = wc.worker_cached(Counting, tag="b")
    assert fa(0)[0] == "a" and fb(0)[0] == "b"
    assert Counting.instances == 2
    # same kwargs → same cached instance even via a NEW wrapper
    fa2 = wc.worker_cached(Counting, tag="a")
    fa2(0)
    assert Counting.instances == 2


def test_cache_is_bounded():
    wc._CACHE.clear()
    Counting.instances = 0
    for i in range(wc._MAX_ENTRIES + 5):
        wc.worker_cached(Counting, tag=f"t{i}")(0)
    assert len(wc._CACHE) <= wc._MAX_ENTRIES
