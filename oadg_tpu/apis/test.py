"""Test APIs (reference mmdet/apis/test.py:368 single_gpu_test / :541
multi_gpu_test). One jitted test step over padded batches; padded device
outputs convert to the reference's per-image per-class numpy det lists."""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.bbox.transforms import bbox2result


def dets_to_results(dets, labels, valid, num_classes: int) -> List[List[np.ndarray]]:
    """(N, K, 5), (N, K), (N, K) -> per image per class (n_i, 5) arrays."""
    dets = np.asarray(dets)
    labels = np.asarray(labels)
    valid = np.asarray(valid)
    out = []
    for i in range(dets.shape[0]):
        v = valid[i]
        out.append(bbox2result(dets[i][v], labels[i][v], num_classes))
    return out


def run_test(test_fn: Callable, params, batch_stats, loader,
             num_classes: int, progress: bool = False) -> List[List[np.ndarray]]:
    """Run the jitted test step over a loader; returns reference-format
    results (list over images of per-class det arrays)."""
    results: List[List[np.ndarray]] = []
    for bi, batch in enumerate(loader):
        arrs = {k: jnp.asarray(v) for k, v in batch.items() if k != "metas"}
        dets, labels, valid = test_fn(params, batch_stats, arrs)
        results.extend(dets_to_results(dets, labels, valid, num_classes))
        if progress:
            print(f"\rtest batch {bi + 1}", end="", flush=True)
    if progress:
        print()
    return results


def single_gpu_test(model_state, data_loader, show=False, out_dir=None,
                    **kwargs):
    """Reference-signature shim: ``model_state`` is a dict with
    test_fn/params/batch_stats/num_classes (built by apis.train or tools)."""
    return run_test(model_state["test_fn"], model_state["params"],
                    model_state.get("batch_stats"), data_loader,
                    model_state["num_classes"], progress=True)


multi_gpu_test = single_gpu_test   # mesh sharding replaces rank collection
