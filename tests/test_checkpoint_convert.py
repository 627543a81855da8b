"""Checkpoint-conversion fidelity: torch forward == flax forward after
convert_* (SURVEY.md §7 hard part #2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from supervised_dispnet_tpu.models import DispNetS, PoseExpNet
from supervised_dispnet_tpu.models import DispResNet as DispResNetModel
from supervised_dispnet_tpu.models.resnet import ResNetEncoder
from supervised_dispnet_tpu.utils.checkpoint import (
    convert_dispnet,
    convert_pose_exp_net,
    convert_resnet_encoder,
    load_torch_state_dict,
)
from tests.torch_ref import TorchDispNetS, TorchPoseExpNet, TorchResNet18Encoder

H, W = 32, 64


@pytest.mark.quick
def test_dispnet_forward_parity():
    torch.manual_seed(0)
    tmodel = TorchDispNetS().eval()
    sd = {k: v for k, v in tmodel.state_dict().items()}
    params = convert_dispnet(sd)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        t_disps = tmodel(torch.from_numpy(x))

    model = DispNetS()
    # validate converted tree structure against a fresh init (eval_shape:
    # structure only, no 36 s eager init)
    ref = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes

    j_disps = jax.jit(model.apply)(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    for td, jd in zip(t_disps, j_disps):
        np.testing.assert_allclose(
            np.asarray(jd)[..., 0], td.numpy()[:, 0], rtol=1e-3, atol=2e-4
        )


def test_pose_exp_net_forward_parity():
    torch.manual_seed(1)
    tmodel = TorchPoseExpNet(nb_ref_imgs=2, output_exp=True).eval()
    params = convert_pose_exp_net(tmodel.state_dict())

    rng = np.random.default_rng(1)
    tgt = rng.standard_normal((2, 3, H, W)).astype(np.float32)
    refs = [rng.standard_normal((2, 3, H, W)).astype(np.float32) for _ in range(2)]
    with torch.no_grad():
        t_masks, t_pose = tmodel(torch.from_numpy(tgt), [torch.from_numpy(r) for r in refs])

    model = PoseExpNet(nb_ref_imgs=2, output_exp=True)
    j_masks, j_pose = model.apply(
        {"params": params},
        jnp.asarray(tgt.transpose(0, 2, 3, 1)),
        [jnp.asarray(r.transpose(0, 2, 3, 1)) for r in refs],
    )
    np.testing.assert_allclose(np.asarray(j_pose), t_pose.numpy(), rtol=1e-3, atol=1e-6)
    for tm, jm in zip(t_masks, j_masks):
        np.testing.assert_allclose(
            np.asarray(jm), tm.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=2e-4
        )


def test_resnet18_encoder_parity():
    torch.manual_seed(2)
    tmodel = TorchResNet18Encoder().eval()
    # randomize BN running stats so the test catches stat-mapping bugs
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    params, stats = convert_resnet_encoder(tmodel.state_dict(), depth=18)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        t_feats = tmodel(torch.from_numpy(x))

    model = ResNetEncoder(depth=18)
    j_feats = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    assert len(t_feats) == len(j_feats) == 5
    for tf, jf in zip(t_feats, j_feats):
        np.testing.assert_allclose(
            np.asarray(jf), tf.numpy().transpose(0, 2, 3, 1), rtol=1e-2, atol=1e-3
        )


def test_load_torch_state_dict_strips_dataparallel(tmp_path):
    torch.manual_seed(3)
    tmodel = TorchDispNetS()
    wrapped = {"epoch": 5, "state_dict": {f"module.{k}": v for k, v in tmodel.state_dict().items()}}
    path = tmp_path / "dispnet_checkpoint.pth.tar"
    torch.save(wrapped, path)
    sd = load_torch_state_dict(path)
    assert "conv1.0.weight" in sd
    params = convert_dispnet(sd)
    assert "conv1" in params


@pytest.mark.parametrize("depth", [18, 50])
def test_bn_folding_preserves_outputs(depth):
    """DispResNet with folded BN == original eval forward (serving path) —
    both BasicBlock (18) and Bottleneck (50) fold paths."""
    from supervised_dispnet_tpu.utils.fold_bn import fold_dispresnet

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-1, 1, (2, H, W, 3)).astype(np.float32))
    model = DispResNetModel(encoder_depth=depth)
    variables = model.init(jax.random.PRNGKey(0), x)
    # perturb BN stats away from init so folding is non-trivial
    import flax

    bs = flax.core.unfreeze(variables["batch_stats"])

    def perturb(t):
        r = np.random.default_rng(1)
        return jax.tree_util.tree_map(
            lambda a: jnp.asarray(
                np.abs(r.standard_normal(a.shape)).astype(np.float32) + 0.5
            )
            if a.ndim else a,
            t,
        )

    bs = perturb(bs)
    variables = {"params": variables["params"], "batch_stats": bs}
    ref = model.apply(variables, x, train=False)

    folded_params = fold_dispresnet(variables["params"], bs)
    folded_model = DispResNetModel(encoder_depth=depth, fold_bn=True)
    got = folded_model.apply({"params": folded_params}, x, train=False)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_flax_to_torch_export_roundtrip():
    """Export our flax DispNetS to a torch state_dict; the torch fixture
    must load it and produce the same forward as the flax model."""
    from supervised_dispnet_tpu.utils.checkpoint import export_dispnet_to_torch

    model = DispNetS()
    x = jnp.zeros((1, H, W, 3))
    params = model.init(jax.random.PRNGKey(3), x)["params"]

    sd_np = export_dispnet_to_torch(params)
    tmodel = TorchDispNetS()
    tmodel.load_state_dict({k: torch.as_tensor(v.copy()) for k, v in sd_np.items()})
    tmodel.eval()

    rng = np.random.default_rng(3)
    xin = rng.standard_normal((1, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        t_disps = tmodel(torch.from_numpy(xin))
    j_disps = model.apply({"params": params}, jnp.asarray(xin.transpose(0, 2, 3, 1)))
    for td, jd in zip(t_disps, j_disps):
        np.testing.assert_allclose(np.asarray(jd)[..., 0], td.numpy()[:, 0],
                                   rtol=1e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# round-2 converter surface: DispResNet full / VGG-BN / FCRN (VERDICT item 3)
# ---------------------------------------------------------------------------

def _randomize_bn_stats(tmodel, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5, generator=g)
            m.running_var.uniform_(0.5, 1.5, generator=g)


@pytest.mark.parametrize("depth", [18, 50])
def test_dispresnet_full_forward_parity(depth):
    """torch DispResNet (encoder+decoder+disp heads) -> flax, forward equal."""
    from supervised_dispnet_tpu.utils.convert_models import convert_dispresnet
    from tests.torch_ref import TorchDispResNet

    torch.manual_seed(10 + depth)
    tmodel = TorchDispResNet(depth=depth).eval()
    _randomize_bn_stats(tmodel, seed=depth)
    params, stats = convert_dispresnet(tmodel.state_dict(), depth=depth)

    model = DispResNetModel(encoder_depth=depth)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    assert (jax.tree_util.tree_map(lambda a: a.shape, ref["params"])
            == jax.tree_util.tree_map(lambda a: a.shape, params))

    rng = np.random.default_rng(depth)
    x = rng.standard_normal((2, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        t_disps = tmodel(torch.from_numpy(x))
    j_disps = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    for td, jd in zip(t_disps, j_disps):
        np.testing.assert_allclose(np.asarray(jd)[..., 0], td.numpy()[:, 0],
                                   rtol=1e-2, atol=1e-3)


def test_dispresnet_classification_head_parity():
    from supervised_dispnet_tpu.utils.convert_models import convert_dispresnet
    from tests.torch_ref import TorchDispResNet

    torch.manual_seed(20)
    tmodel = TorchDispResNet(depth=18, head="classification", num_bins=16).eval()
    _randomize_bn_stats(tmodel, seed=20)
    params, stats = convert_dispresnet(tmodel.state_dict(), depth=18,
                                       head="classification")
    model = DispResNetModel(encoder_depth=18, head="classification", num_bins=16)

    rng = np.random.default_rng(20)
    x = rng.standard_normal((2, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x))
    j_logits = model.apply({"params": params, "batch_stats": stats},
                           jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(j_logits),
                               t_logits.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-2, atol=1e-3)


def test_disp_vgg_bn_forward_parity():
    from supervised_dispnet_tpu.models import DispVggBN
    from supervised_dispnet_tpu.utils.convert_models import convert_disp_vgg_bn
    from tests.torch_ref import TorchDispVggBN

    torch.manual_seed(30)
    tmodel = TorchDispVggBN().eval()
    _randomize_bn_stats(tmodel, seed=30)
    params, stats = convert_disp_vgg_bn(tmodel.state_dict())
    model = DispVggBN()
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    assert (jax.tree_util.tree_map(lambda a: a.shape, ref["params"])
            == jax.tree_util.tree_map(lambda a: a.shape, params))

    rng = np.random.default_rng(30)
    x = rng.standard_normal((1, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        t_disps = tmodel(torch.from_numpy(x))
    j_disps = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    for td, jd in zip(t_disps, j_disps):
        np.testing.assert_allclose(np.asarray(jd)[..., 0], td.numpy()[:, 0],
                                   rtol=1e-2, atol=1e-3)


def test_fcrn_forward_parity():
    """FCRN parity — also proves the input-dilated conv == Laina
    unpool+conv formulation end-to-end (models/fcrn.py)."""
    from supervised_dispnet_tpu.models import FCRN
    from supervised_dispnet_tpu.utils.convert_models import FCRNNameMap, convert_fcrn
    from tests.torch_ref import TorchFCRN

    torch.manual_seed(40)
    tmodel = TorchFCRN().eval()
    _randomize_bn_stats(tmodel, seed=40)
    params, stats = convert_fcrn(tmodel.state_dict(),
                                 FCRNNameMap(encoder_prefix="encoder."))
    model = FCRN()
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    assert (jax.tree_util.tree_map(lambda a: a.shape, ref["params"])
            == jax.tree_util.tree_map(lambda a: a.shape, params))

    rng = np.random.default_rng(40)
    x = rng.standard_normal((1, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        t_depth = tmodel(torch.from_numpy(x))
    j_depth = model.apply({"params": params, "batch_stats": stats},
                          jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(j_depth)[..., 0],
                               t_depth.numpy()[:, 0], rtol=1e-2, atol=1e-3)


def test_dispresnet_export_roundtrip():
    """flax -> torch state_dict -> torch fixture forward == flax forward."""
    from supervised_dispnet_tpu.utils.convert_models import export_dispresnet_to_torch
    from tests.torch_ref import TorchDispResNet

    model = DispResNetModel(encoder_depth=18)
    x0 = jnp.zeros((1, H, W, 3))
    variables = model.init(jax.random.PRNGKey(5), x0)
    sd_np = export_dispresnet_to_torch(variables["params"],
                                       variables["batch_stats"], depth=18)
    tmodel = TorchDispResNet(depth=18)
    tmodel.load_state_dict({k: torch.as_tensor(np.ascontiguousarray(v))
                            for k, v in sd_np.items()})
    tmodel.eval()

    rng = np.random.default_rng(5)
    xin = rng.standard_normal((1, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        t_disps = tmodel(torch.from_numpy(xin))
    j_disps = model.apply(variables, jnp.asarray(xin.transpose(0, 2, 3, 1)),
                          train=False)
    for td, jd in zip(t_disps, j_disps):
        np.testing.assert_allclose(np.asarray(jd)[..., 0], td.numpy()[:, 0],
                                   rtol=1e-2, atol=1e-3)


def test_converter_missing_key_diagnostic():
    from supervised_dispnet_tpu.utils.convert_models import (
        ConversionError, convert_dispresnet,
    )
    from tests.torch_ref import TorchDispResNet

    sd = TorchDispResNet(depth=18).state_dict()
    bad = {k: v for k, v in sd.items() if not k.startswith("iconv2")}
    with pytest.raises(ConversionError, match="iconv2.0.weight"):
        convert_dispresnet(bad, depth=18)
