"""Full-model torch-vs-flax parity through the checkpoint converter.

VERDICT.md round-1 item 2: the public-checkpoint "<=0.05 dB" goal is
unverifiable against the empty reference mount, so this is the testable
proxy — torch replicas of EDVR (PCD+TSA+DCN_sep with a pure-torch CUDA-
semantics deformable conv), TOF/SpyNet, and DUF-16L (tests/torch_replicas.py,
built from SURVEY.md §2.1) are randomly initialized, their state_dicts run
through convert/torch_import.py, and the converted flax forward must agree
with the torch forward to ~1e-4. This exercises every name-map row, the
OIHW->HWIO / OIDHW->DHWIO transposes, scan-trunk stacking, BN stat
conversion, and the DCN channel-layout contract end to end.
"""

import pytest

# Compile-heavy on CPU: behind the slow marker (pytest.ini; VERDICT r2 #8).
pytestmark = pytest.mark.slow

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dynavsr_tpu.convert.torch_import import convert_state_dict

import torch_replicas as tr  # tests/ is on sys.path under pytest rootdir


def _state_dict_np(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()
            if not k.endswith("num_batches_tracked")}


def _randomize_bn(module):
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            m.running_mean.normal_(0.0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
            torch.nn.init.normal_(m.weight, 1.0, 0.1)
            torch.nn.init.normal_(m.bias, 0.0, 0.1)


def _randomize_dcn(module):
    # zero-init offsets would only sample integer positions; make them
    # small fractional displacements so bilinear sampling is exercised.
    for m in module.modules():
        if isinstance(m, tr.DCN_sep):
            torch.nn.init.normal_(m.conv_offset_mask.weight, 0.0, 0.02)
            torch.nn.init.normal_(m.conv_offset_mask.bias, 0.0, 0.3)


def _convert_and_compare(tmodel, fmodel, x_nchw, frames_axis=True,
                         atol=2e-4, rtol=1e-4):
    tmodel.eval()
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x_nchw)).numpy()
    # NCHW (torch, frames on dim 1) -> NHWC frames-on-axis-1
    x_flax = np.transpose(x_nchw, (0, 1, 3, 4, 2)) if frames_axis else x_nchw
    template = jax.eval_shape(
        fmodel.init, jax.random.PRNGKey(0), jnp.zeros(x_flax.shape, jnp.float32))
    params = convert_state_dict(_state_dict_np(tmodel), template)
    got = np.asarray(fmodel.apply(params, jnp.asarray(x_flax)))
    want_nhwc = np.transpose(want, (0, 2, 3, 1))
    np.testing.assert_allclose(got, want_nhwc, atol=atol, rtol=rtol)
    return params


def test_edvr_full_forward_parity():
    from dynavsr_tpu.models.edvr import EDVR

    torch.manual_seed(0)
    tmodel = tr.EDVR(nf=16, nframes=5, groups=2, front_RBs=2, back_RBs=3)
    _randomize_dcn(tmodel)
    fmodel = EDVR(nf=16, nframes=5, groups=2, front_RBs=2, back_RBs=3)
    x = np.random.default_rng(0).uniform(0, 1, (1, 5, 3, 16, 16)).astype(np.float32)
    _convert_and_compare(tmodel, fmodel, x)


def test_edvr_no_tsa_forward_parity():
    from dynavsr_tpu.models.edvr import EDVR

    torch.manual_seed(1)
    tmodel = tr.EDVR(nf=16, nframes=3, groups=2, front_RBs=1, back_RBs=2,
                     w_TSA=False)
    _randomize_dcn(tmodel)
    fmodel = EDVR(nf=16, nframes=3, groups=2, front_RBs=1, back_RBs=2,
                  w_TSA=False)
    x = np.random.default_rng(1).uniform(0, 1, (1, 3, 3, 16, 16)).astype(np.float32)
    _convert_and_compare(tmodel, fmodel, x)


def test_tof_full_forward_parity():
    from dynavsr_tpu.models.tof import TOFlow

    torch.manual_seed(2)
    tmodel = tr.TOFlow()
    _randomize_bn(tmodel)
    fmodel = TOFlow()
    x = np.random.default_rng(2).uniform(0, 1, (1, 7, 3, 16, 16)).astype(np.float32)
    _convert_and_compare(tmodel, fmodel, x)


def test_duf_16l_full_forward_parity():
    from dynavsr_tpu.models.duf import DUF

    torch.manual_seed(3)
    tmodel = tr.DUF(scale=4, dense1_layers=3)
    _randomize_bn(tmodel)
    fmodel = DUF(scale=4, dense1_layers=3)
    x = np.random.default_rng(3).uniform(0, 1, (1, 7, 3, 8, 8)).astype(np.float32)
    _convert_and_compare(tmodel, fmodel, x)


def test_torch_dcn_matches_jax_ref():
    """The pure-torch deformable conv itself must match ops/dcn_ref.py (the
    tested oracle) — pins the CUDA sampling semantics both sides claim."""
    from dynavsr_tpu.ops.dcn_ref import deform_conv2d_ref

    rng = np.random.default_rng(7)
    b, h, w, cin, cout, gd = 2, 6, 5, 8, 8, 2
    k = 9
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    offset = (rng.standard_normal((b, h, w, 2 * gd * k)) * 1.5).astype(np.float32)
    mask = rng.uniform(0, 1, (b, h, w, gd * k)).astype(np.float32)
    weight = (rng.standard_normal((3, 3, cin, cout)) * 0.1).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)

    want = np.asarray(deform_conv2d_ref(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias), deformable_groups=gd))
    got = tr.modulated_deform_conv(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(offset.transpose(0, 3, 1, 2)),
        torch.from_numpy(mask.transpose(0, 3, 1, 2)),
        torch.from_numpy(weight.transpose(3, 2, 0, 1)),
        torch.from_numpy(bias), deformable_groups=gd,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_edvr_predeblur_forward_parity():
    """predeblur=True routes through Predeblur_ResNet_Pyramid + conv_1x1
    (EDVR_arch [H], detail [M]) — validates the converter's name map for
    the deblur pyramid RBs."""
    from dynavsr_tpu.models.edvr import EDVR

    torch.manual_seed(2)
    tmodel = tr.EDVR(nf=16, nframes=3, groups=2, front_RBs=1, back_RBs=2,
                     predeblur=True)
    _randomize_dcn(tmodel)
    fmodel = EDVR(nf=16, nframes=3, groups=2, front_RBs=1, back_RBs=2,
                  predeblur=True)
    x = np.random.default_rng(2).uniform(0, 1, (1, 3, 3, 16, 16)).astype(np.float32)
    _convert_and_compare(tmodel, fmodel, x)


def test_edvr_predeblur_hr_in_forward_parity():
    """predeblur + HR_in: HR-sized input, strided deblur front-end, identity
    base skip (out + x_center)."""
    from dynavsr_tpu.models.edvr import EDVR

    torch.manual_seed(3)
    tmodel = tr.EDVR(nf=16, nframes=3, groups=2, front_RBs=1, back_RBs=2,
                     predeblur=True, HR_in=True)
    _randomize_dcn(tmodel)
    fmodel = EDVR(nf=16, nframes=3, groups=2, front_RBs=1, back_RBs=2,
                  predeblur=True, hr_in=True)
    x = np.random.default_rng(3).uniform(0, 1, (1, 3, 3, 32, 32)).astype(np.float32)
    _convert_and_compare(tmodel, fmodel, x)


def test_edvr_hr_in_forward_parity():
    """HR_in without predeblur: strided conv_first_1/2/3 front-end."""
    from dynavsr_tpu.models.edvr import EDVR

    torch.manual_seed(4)
    tmodel = tr.EDVR(nf=16, nframes=3, groups=2, front_RBs=1, back_RBs=2,
                     HR_in=True)
    _randomize_dcn(tmodel)
    fmodel = EDVR(nf=16, nframes=3, groups=2, front_RBs=1, back_RBs=2,
                  hr_in=True)
    x = np.random.default_rng(4).uniform(0, 1, (1, 3, 3, 32, 32)).astype(np.float32)
    _convert_and_compare(tmodel, fmodel, x)


def test_duf_28l_full_forward_parity():
    """Depth generalization of the converter: DUF-28L only differs from
    16L in dense1_layers (9 vs 3) — catches any depth-indexed name-mapping
    bug in convert/torch_import.py."""
    from dynavsr_tpu.models.duf import DUF

    torch.manual_seed(4)
    tmodel = tr.DUF(scale=4, dense1_layers=9)
    _randomize_bn(tmodel)
    fmodel = DUF(scale=4, dense1_layers=9)
    x = np.random.default_rng(4).uniform(0, 1, (1, 7, 3, 8, 8)).astype(np.float32)
    _convert_and_compare(tmodel, fmodel, x)
