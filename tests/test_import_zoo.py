"""Zoo checkpoint-importer tests.

Where the reference torch module is self-contained (CGNet, LMFFNet depend
only on torch), these tests are true oracles: instantiate the REFERENCE
module from /root/reference at test time, convert its randomly-initialized
state_dict with the importer, and require the flax forward to match the
torch forward numerically. Skipped when the reference snapshot is absent.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from quber_tpu.models import import_zoo as IZ

REF = "/root/reference/foreground_segmentation"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference snapshot not available"
)


def _load_ref_module(name):
    sys.path.insert(0, REF)
    try:
        import importlib

        return importlib.import_module(name)
    finally:
        sys.path.remove(REF)


def _randomize_bn_stats(model, seed=0):
    """Give BN layers non-trivial running stats so mismatches can't hide."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)


@needs_reference
def test_cgnet_import_matches_reference_torch(rng):
    cgnet_ref = _load_ref_module("cgnet")
    torch.manual_seed(0)
    # small M/N keeps the oracle fast; the mapping code is the same per block
    ref = cgnet_ref.Context_Guided_Network(classes=2, in_channel=4, M=2, N=3).eval()
    _randomize_bn_stats(ref)

    from quber_tpu.models.cgnet import CGNet

    variables = IZ.import_cgnet(
        {k: v.numpy() for k, v in ref.state_dict().items()}, m=2, n=3
    )
    model = CGNet(classes=2, in_channels=4, m=2, n=3)

    x = rng.rand(1, 64, 64, 4).astype(np.float32)
    want = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).detach().numpy()
    got = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=2e-4
    )


@needs_reference
def test_lmffnet_import_matches_reference_torch(rng):
    lm_ref = _load_ref_module("lmffnet")
    torch.manual_seed(0)
    ref = lm_ref.LMFFNet(classes=3, block_1=1, block_2=2).eval()
    _randomize_bn_stats(ref)

    from quber_tpu.models.lmffnet import LMFFNet

    variables = IZ.import_lmffnet(
        {k: v.numpy() for k, v in ref.state_dict().items()}, block_1=1, block_2=2
    )
    model = LMFFNet(classes=3, block_1=1, block_2=2)

    x = rng.rand(1, 64, 64, 6).astype(np.float32)
    want = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).detach().numpy()
    got = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=2e-4
    )


@needs_reference
def test_cgnet_import_full_size_strict():
    """Full-size (M=3, N=21) mapping consumes every checkpoint key."""
    cgnet_ref = _load_ref_module("cgnet")
    torch.manual_seed(1)
    ref = cgnet_ref.Context_Guided_Network(classes=2, in_channel=4)
    variables = IZ.import_cgnet({k: v.numpy() for k, v in ref.state_dict().items()})
    n_leaves = len(
        [1 for _ in _iter_leaves(variables["params"])]
    )
    assert n_leaves > 300


def _iter_leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _iter_leaves(v)
        else:
            yield v
