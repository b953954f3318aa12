"""Checkpoint save/resume + torch->JAX converter tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynavsr_tpu.convert.torch_import import convert_state_dict, flax_to_torch_key
from dynavsr_tpu.models.edvr import EDVR
from dynavsr_tpu.train.checkpoint import (
    latest_checkpoint_iter,
    load_network,
    resume_training,
    save_network,
    save_training_state,
)


def tiny_edvr():
    return EDVR(nf=8, nframes=3, groups=2, front_RBs=2, back_RBs=2)


@pytest.fixture(scope="module")
def edvr_params():
    model = tiny_edvr()
    x = jnp.zeros((1, 3, 8, 8, 3))
    return model.init(jax.random.PRNGKey(0), x)


# ---------------------------------------------------------------- checkpoints
def test_save_load_network_roundtrip(tmp_path, edvr_params):
    p = save_network(str(tmp_path / "models"), 100, edvr_params)
    restored = load_network(p, like=edvr_params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        edvr_params, restored,
    )
    assert latest_checkpoint_iter(str(tmp_path / "models")) == 100


def test_training_state_roundtrip(tmp_path, edvr_params):
    import optax

    tx = optax.adam(1e-4)
    opt_state = tx.init(edvr_params)
    p = save_training_state(str(tmp_path / "state"), 3, 5000, opt_state)
    epoch, it, restored = resume_training(p, opt_state)
    assert (epoch, it) == (3, 5000)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        opt_state, restored,
    )


def test_load_network_nonstrict_keeps_mismatched(tmp_path, edvr_params):
    p = save_network(str(tmp_path / "m"), 1, edvr_params)
    other = jax.tree_util.tree_map(lambda a: np.asarray(a).copy(), edvr_params)
    restored = load_network(p, like=other, strict=False)
    assert jax.tree_util.tree_structure(restored) == jax.tree_util.tree_structure(other)


# ------------------------------------------------------------------ converter
def _fake_torch_sd_from_template(params):
    """Build a torch-layout state_dict covering a flax template (random)."""
    rng = np.random.default_rng(0)
    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for keypath, leaf in flat:
        names = tuple(k.key for k in keypath)
        if names[0] == "params":
            names = names[1:]
        shape = np.shape(leaf)
        if "blocks" in names:
            i_b = names.index("blocks")
            prefix, suffix = names[:i_b], [n for n in names[i_b + 1:] if n != "block"]
            for i in range(shape[0]):
                key, is_w = flax_to_torch_key(tuple(list(prefix) + [str(i)] + suffix))
                s = shape[1:]
                if is_w and len(s) == 4:
                    s = (s[3], s[2], s[0], s[1])  # HWIO -> OIHW
                sd[key] = rng.standard_normal(s).astype(np.float32)
        else:
            key, is_w = flax_to_torch_key(names)
            s = shape
            if is_w and len(s) == 4:
                s = (s[3], s[2], s[0], s[1])
            sd[key] = rng.standard_normal(s).astype(np.float32)
    return sd


def test_convert_edvr_template(edvr_params):
    sd = _fake_torch_sd_from_template(edvr_params)
    # torch keys look like the reference's EDVR state_dict
    assert any(k.startswith("conv_first.") for k in sd)
    assert any("dcnpack.conv_offset_mask.weight" in k for k in sd)
    assert any(k.startswith("feature_extraction.0.") for k in sd)
    out = convert_state_dict(sd, edvr_params)
    assert jax.tree_util.tree_structure(out) == jax.tree_util.tree_structure(edvr_params)
    # spot-check layout transpose: conv_first kernel
    got = np.asarray(out["params"]["conv_first"]["kernel"])
    want = sd["conv_first.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)
    # stacked trunk block 1
    got = np.asarray(out["params"]["feature_extraction"]["blocks"]["block"]["conv1"]["kernel"])[1]
    want = sd["feature_extraction.1.conv1.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)


def test_convert_missing_key_raises(edvr_params):
    sd = _fake_torch_sd_from_template(edvr_params)
    sd.pop("conv_first.weight")
    with pytest.raises(KeyError, match="conv_first.weight"):
        convert_state_dict(sd, edvr_params)


def test_torch_conv_semantic_parity():
    """Converted conv weights produce the same output as torch.nn.Conv2d."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 7, 9, 4)).astype(np.float32)
    tconv = torch.nn.Conv2d(4, 6, 3, stride=2, padding=1)
    with torch.no_grad():
        ty = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    sd = {"c.weight": tconv.weight.detach().numpy(), "c.bias": tconv.bias.detach().numpy()}

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(6, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], name="c")(x)

    m = M()
    template = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_state_dict(sd, template)
    jy = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(jy, ty, atol=2e-5)


def test_batchnorm_conversion_matches_torch():
    """flax BatchNorm (inference) with converted torch BN params/stats."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 5, 6, 4)).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(4)
    with torch.no_grad():
        tbn.weight.copy_(torch.rand(4) + 0.5)
        tbn.bias.copy_(torch.rand(4))
        tbn.running_mean.copy_(torch.rand(4))
        tbn.running_var.copy_(torch.rand(4) + 0.5)
    tbn.eval()
    with torch.no_grad():
        ref = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.BatchNorm(use_running_average=True, name="bn")(x)

    m = M()
    template = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {
        "bn.weight": tbn.weight.detach().numpy(),
        "bn.bias": tbn.bias.detach().numpy(),
        "bn.running_mean": tbn.running_mean.numpy(),
        "bn.running_var": tbn.running_var.numpy(),
    }
    variables = convert_state_dict(sd, template)
    ours = np.asarray(m.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_duf_template_conversion_roundtrip():
    """DUF template (3D convs + BN batch_stats) fully converts."""
    from dynavsr_tpu.models.duf import DUF

    model = DUF(scale=4, dense1_layers=1)
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 7, 8, 8, 3)))
    )
    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), template)

    rng = np.random.default_rng(4)
    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(template)[0]
    for keypath, leaf in flat:
        names = tuple(k.key for k in keypath)
        if names[0] in ("params", "batch_stats"):
            names = names[1:]
        key, is_w = flax_to_torch_key(names)
        s = np.shape(leaf)
        if is_w and len(s) == 5:
            s = (s[4], s[3], s[0], s[1], s[2])  # DHWIO -> OIDHW
        elif is_w and len(s) == 4:
            s = (s[3], s[2], s[0], s[1])
        sd[key] = rng.standard_normal(s).astype(np.float32)
    assert any("running_mean" in k for k in sd)
    out = convert_state_dict(sd, template)
    got = np.asarray(out["params"]["conv3d_1"]["kernel"])
    want = sd["conv3d_1.weight"].transpose(2, 3, 4, 1, 0)
    np.testing.assert_array_equal(got, want)
    got_bn = np.asarray(out["batch_stats"]["dense1_0"]["bn1"]["mean"])
    np.testing.assert_array_equal(got_bn, sd["dense1_0.bn1.running_mean"])
