"""with_cp (activation checkpointing; reference resnet.py:87
torch.utils.checkpoint -> nn.remat here) must not change values or
gradients — only the backward-pass memory/recompute trade."""
import sys, os

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from oadg_tpu.models.backbones.resnet import ResNet


def test_with_cp_matches_plain():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3),
                    jnp.float32)
    kw = dict(depth=18, base_channels=8, stem_channels=8,
              out_indices=(0, 3))
    plain = ResNet(**kw)
    remat = ResNet(with_cp=True, **kw)
    v = jax.jit(plain.init)(jax.random.PRNGKey(0), x)
    # identical param trees: remat wraps the same modules
    v2 = jax.jit(remat.init)(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)

    def loss(m, variables):
        outs = m.apply(variables, x)
        return sum(jnp.sum(o ** 2) for o in outs)

    l1, g1 = jax.value_and_grad(lambda vv: loss(plain, vv))(v)
    l2, g2 = jax.value_and_grad(lambda vv: loss(remat, vv))(v)
    assert np.allclose(float(l1), float(l2), rtol=1e-6)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    for a, b in zip(flat1, flat2):
        # recompute reassociates float sums; observed max rel diff ~3e-4
        # (deepest-chain stem conv) with identical loss — tolerance is
        # about wiring errors, not bitwise equality
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-2)
