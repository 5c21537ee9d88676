"""FLOPs/params counter (reference tools/analysis_tools/get_flops.py) via
jax AOT cost analysis."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--shape", type=int, nargs="+", default=[1024, 2048])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from oadg_tpu.config import Config
    from oadg_tpu.models import build_detector
    cfg = Config.fromfile(args.config)
    det = build_detector(dict(cfg.model), num_views=1)
    h, w = args.shape if len(args.shape) == 2 else (args.shape[0],) * 2
    batch = {"img": jnp.zeros((1, h, w, 3), jnp.float32),
             "img_shape": jnp.asarray([[float(h), float(w)]]),
             "scale_factor": jnp.ones((1, 4), jnp.float32)}
    variables = jax.eval_shape(
        lambda r, b: det.init(r, b, "test"),
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch)
    n_params = sum(int(jnp.prod(jnp.asarray(x.shape)))
                   for x in jax.tree_util.tree_leaves(variables["params"]))
    lowered = jax.jit(lambda v, b: det.apply(v, b, "test")).lower(
        jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), variables), batch)
    cost = lowered.compile().cost_analysis()
    flops = (cost or {}).get("flops", float("nan"))
    print(f"Input shape: (1, {h}, {w}, 3)")
    print(f"Params: {n_params/1e6:.2f} M")
    print(f"FLOPs (XLA cost analysis): {flops/1e9:.2f} GFLOPs")


if __name__ == "__main__":
    main()
