"""Benchmark: OA-DG Faster R-CNN R50-FPN train-step throughput on one chip.

Runs the flagship config's FULL training step (multi-view forward, RPN +
RoI + contrastive losses, backward, SGD update) at the Cityscapes training
resolution (1024x2048) with batch 2 x 2 views, bf16 compute, on whatever
chip jax exposes, and prints ONE JSON line.

Baseline note: the reference publishes no throughput numbers
(BASELINE.md: "published: {}"). ``vs_baseline`` is measured against an
estimated reference rate of 2.0 dataset-samples/sec — a generous estimate
for mmdet Faster R-CNN R50-FPN at 2048x1024, batch 2/GPU on a V100-class
GPU where the OA-Mix CPU pipeline (reference oa_mix.py, ~0.5-2 s/sample in
dataloader workers) does not bottleneck. The north-star target is 5x that.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_oadg")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import jax.numpy as jnp
import numpy as np

BASELINE_SAMPLES_PER_SEC = 2.0     # estimated reference throughput (see above)


def main():
    from __graft_entry__ import _flagship_model_cfg, _train_batch
    from oadg_tpu.engine.optim import build_lr_schedule, build_optimizer
    from oadg_tpu.engine.preprocess import make_oadg_preprocess
    from oadg_tpu.engine.train_step import make_train_step
    from oadg_tpu.models import build_detector

    cfg, model = _flagship_model_cfg(tiny=False)
    num_views = int(cfg.get("num_views", 2))

    # Default per-chip batch 4 (clean samples; x2 views = 8 images/step):
    # the throughput/chip sweet spot on a 16 GB v5e — batch 2 reaches 5.60
    # samples/s, batch 4 reaches 7.69 (fixed per-step costs amortize),
    # batch 8 exceeds HBM (20.5 G). The reference recipe's global batch is
    # preserved by the pod shape (e.g. 2 chips x 4 = mmdet's 4 GPUs x 2).
    b = int(os.environ.get("BENCH_BATCH", "4"))          # clean samples/step
    h = int(os.environ.get("BENCH_H", "1024"))
    w = int(os.environ.get("BENCH_W", "2048"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))

    det = build_detector(model, num_views=num_views, dtype=jnp.bfloat16)
    # loader-format batch: B clean samples; OA-Mix + view integration run
    # on-device inside the step (engine/preprocess.py). The batch is
    # GENERATED on device and synced — in this environment host->device
    # rides a <0.1 MB/s tunnel, and an uploaded batch was billed to
    # "compile" (the lowering blocks on the device queue).
    from __graft_entry__ import _train_batch_device
    batch = _train_batch_device(b, h, w, g=16, raw=True)
    preprocess = make_oadg_preprocess(dict(cfg.oamix_config),
                                      dict(cfg.img_norm_cfg))

    # init at a tiny spatial size — params are shape-independent, so the big
    # compile happens once, for the real step only
    init_batch = _train_batch(num_views, 64, 64, g=4)
    variables = jax.jit(lambda rngs, bb: det.init(rngs, bb, "train"))(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        init_batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")

    sched = build_lr_schedule(cfg.get("lr_config"), cfg.optimizer["lr"], 1000)
    tx = build_optimizer(params, cfg.optimizer, sched, model_cfg=model)
    opt_state = tx.init(params)

    # donate=True matches real training (the runner reassigns params/
    # opt_state every step) and is what lets batch 8 fit in HBM.
    donate = os.environ.get("BENCH_DONATE", "1") == "1"
    step = make_train_step(det, tx, mesh=None, donate=donate,
                           preprocess=preprocess)
    print("bench: params initialized, compiling step...", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    params, batch_stats, opt_state, log_vars = step(params, batch_stats, opt_state, batch,
                                       jax.random.PRNGKey(2))
    _ = float(log_vars["loss"])
    compile_s = time.perf_counter() - t0
    print(f"bench: compiled in {compile_s:.1f}s", file=sys.stderr, flush=True)

    # Chained-dispatch timing: dispatch all steps back-to-back (each step's
    # params feed the next, so the device executes them sequentially) and
    # sync ONCE at the end by fetching the final loss scalar. Real training
    # overlaps dispatch with device execution and fetches logs every ~50
    # iters; timing a host sync into every step would bill the ~26 ms tunnel
    # round-trip of this environment to the train step. block_until_ready
    # does not reliably block on tunneled backends, hence the scalar fetch.
    t0 = time.perf_counter()
    for i in range(steps):
        params, batch_stats, opt_state, log_vars = step(params, batch_stats, opt_state,
                                           batch, jax.random.PRNGKey(3 + i))
    _ = float(log_vars["loss"])
    step_s = (time.perf_counter() - t0) / steps
    samples_per_sec = b / step_s
    print(json.dumps({
        "metric": "oadg_frcnn_r50_cityscapes_train_samples_per_sec_per_chip_oamix_on_device",
        "value": round(samples_per_sec, 3),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 3),
        "detail": {
            "step_seconds_median": round(step_s, 4),
            "compile_seconds": round(compile_s, 1),
            "batch_clean": b, "num_views": num_views,
            "image_hw": [h, w], "dtype": "bfloat16",
            "loss": float(log_vars["loss"]),
            "device": str(jax.devices()[0]),
            "baseline_note": "reference publishes no throughput; baseline is "
                             "an estimated 2.0 samples/s (see bench.py docstring)",
        },
    }))


if __name__ == "__main__":
    main()
