"""Distributed evaluation collection (VERDICT r2 Missing #3): the
all-gather replacement for the reference's tmpdir pickle exchange
(mmdet/apis/test.py:589 collect_results_cpu) plus the multi_gpu_test
dataset-order restore.
"""
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest


def _fake_result(i, num_classes=3):
    """Deterministic per-image per-class det arrays keyed by ds index."""
    out = []
    for c in range(num_classes):
        k = (i + c) % 3
        if k == 0:
            out.append(np.zeros((0, 5), np.float32))
        else:
            a = np.arange(k * 5, dtype=np.float32).reshape(k, 5) + i * 100 + c
            out.append(a)
    return out


def test_collect_single_process_order_restore():
    from oadg_tpu.apis.test import collect_results_allgather
    n = 7
    perm = [3, 0, 6, 1, 5, 2, 4]
    results = [_fake_result(i) for i in perm]
    merged = collect_results_allgather(results, perm, n, 3)
    assert len(merged) == n
    for i in range(n):
        want = _fake_result(i)
        for a, b in zip(merged[i], want):
            np.testing.assert_allclose(a, b)


def test_collect_drops_wraparound_duplicates():
    from oadg_tpu.apis.test import collect_results_allgather
    n = 4
    idxs = [0, 1, 2, 3, 0, 1]     # loader padding repeats 0, 1
    results = [_fake_result(i) for i in [0, 1, 2, 3]] + [
        [np.full((1, 5), -99, np.float32) for _ in range(3)]] * 2
    merged = collect_results_allgather(results, idxs, n, 3)
    for i in range(n):
        for a, b in zip(merged[i], _fake_result(i)):
            np.testing.assert_allclose(a, b)   # first copy won


SUBPROC = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=2, process_id=pid)
    sys.path.insert(0, {repo!r})
    sys.path.insert(0, {repo!r} + "/tests")
    import numpy as np
    from oadg_tpu.apis.test import multi_gpu_test
    from oadg_tpu.data.builder import PrefetchLoader
    from test_dist_eval import _fake_result

    class DS:
        flag = np.zeros(11, np.uint8)
        def __len__(self):
            return 11
        def __getitem__(self, i):
            return {{"img": np.zeros((8, 8, 3), np.float32),
                     "img_metas": dict(img_shape=(8, 8, 3),
                                       scale_factor=[1, 1, 1, 1]),
                     "idx": np.array([i])}}

    loader = PrefetchLoader(DS(), samples_per_gpu=2, num_workers=1,
                            shuffle=False, drop_last=False, rank=pid,
                            world_size=2)
    # fake test_fn: derive detections from batch image index encoded via
    # a wrapper iterator that tags batches with their dataset indices
    order = loader.result_indices()
    it = iter(np.split(order, len(order) // 2))

    class TagLoader:
        dataset = loader.dataset
        def result_indices(self):
            return order
        def __iter__(self):
            for idxs in np.split(order, len(order) // 2):
                yield {{"__idxs__": idxs}}

    def fake_test_fn(params, stats, batch):
        raise AssertionError("unused")

    # monkeypatch run_test's batch path: supply precomputed results via a
    # fake jitted fn keyed on the batch
    import oadg_tpu.apis.test as T
    def fake_run_test(test_fn, params, stats, ld, nc, progress=False,
                      detector=None):
        res = []
        for b in ld:
            for i in b["__idxs__"]:
                res.append(_fake_result(int(i)))
        return res
    T_run = T.run_test
    T.run_test = fake_run_test
    state = dict(test_fn=None, params=None, batch_stats=None, num_classes=3)
    merged = T.multi_gpu_test(state, TagLoader())
    assert len(merged) == 11, len(merged)
    for i in range(11):
        want = _fake_result(i)
        for a, b in zip(merged[i], want):
            assert np.allclose(a, b), (i, a, b)
    print(f"proc {{pid}}: merged 11 results OK")
""")


@pytest.mark.slow
def test_two_process_eval_collection(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker_eval.py"
    script.write_text(SUBPROC.format(repo=repo))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, str(script), str(i), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "OK" in out
