"""Pure-torch replica modules for full-model converter validation.

The reference mount is empty (SURVEY.md §0), so the official .pth
checkpoints cannot be scored. These replicas rebuild the reference
architectures (models/archs/{EDVR,TOF,DUF}_arch.py per SURVEY.md §2.1) in
plain torch — including a pure-torch modulated deformable conv with the
CUDA kernel's exact sampling semantics (deform_conv_cuda_kernel.cu
`dmcn_im2col_bilinear`: zero outside, per-tap inside test) — with the SAME
attribute names our flax modules use. Converting their state_dicts through
convert/torch_import.py and asserting full-forward agreement turns the
"<=0.05 dB vs public checkpoints" goal into a testable proxy: any name-map,
layout (OIHW->HWIO), channel-order, or semantic mismatch shows up as a
forward diff.

Test-support code only; not shipped in the package.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------------- DCN
def modulated_deform_conv(x, offset, mask, weight, bias, stride=1, padding=1,
                          dilation=1, deformable_groups=1):
    """CUDA-kernel-semantics modulated deformable conv (groups=1).

    x: (B, Cin, H, W); offset: (B, 2*Gd*K, Ho, Wo) with channel 2*(g*K+k)
    the dy and 2*(g*K+k)+1 the dx of deformable group g, tap k (row-major
    kernel window); mask: (B, Gd*K, Ho, Wo) post-sigmoid; weight OIHW.
    """
    b, cin, h, w = x.shape
    cout, cin_w, kh, kw = weight.shape
    assert cin_w == cin, "groups=1 only (EDVR uses groups=1 DCN weights)"
    k = kh * kw
    gd = deformable_groups
    cg = cin // gd
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    dt = x.dtype

    oy = torch.arange(ho, dtype=dt) * stride - padding
    ox = torch.arange(wo, dtype=dt) * stride - padding
    ty = torch.arange(kh, dtype=dt) * dilation
    tx = torch.arange(kw, dtype=dt) * dilation
    base_y = (oy.view(ho, 1, 1, 1) + ty.view(1, 1, kh, 1)).expand(ho, wo, kh, kw)
    base_x = (ox.view(1, wo, 1, 1) + tx.view(1, 1, 1, kw)).expand(ho, wo, kh, kw)
    base_y = base_y.reshape(ho, wo, k).permute(2, 0, 1)  # (K, Ho, Wo)
    base_x = base_x.reshape(ho, wo, k).permute(2, 0, 1)

    off = offset.view(b, gd, k, 2, ho, wo)
    ys = base_y.view(1, 1, k, ho, wo) + off[:, :, :, 0]
    xs = base_x.view(1, 1, k, ho, wo) + off[:, :, :, 1]

    y0 = torch.floor(ys)
    x0 = torch.floor(xs)
    wy1, wx1 = ys - y0, xs - x0
    wy0, wx0 = 1.0 - wy1, 1.0 - wx1
    imgs = x.view(b, gd, cg, h * w)

    def tap(yi, xi, wt):
        inside = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)).to(dt)
        yc = yi.clamp(0, h - 1).long()
        xc = xi.clamp(0, w - 1).long()
        idx = (yc * w + xc).reshape(b, gd, 1, -1).expand(b, gd, cg, k * ho * wo)
        vals = torch.gather(imgs, 3, idx).view(b, gd, cg, k, ho, wo)
        return vals * (wt * inside).view(b, gd, 1, k, ho, wo)

    cols = (tap(y0, x0, wy0 * wx0) + tap(y0, x0 + 1, wy0 * wx1)
            + tap(y0 + 1, x0, wy1 * wx0) + tap(y0 + 1, x0 + 1, wy1 * wx1))
    if mask is not None:
        cols = cols * mask.view(b, gd, 1, k, ho, wo)
    cols = cols.reshape(b, cin, k, ho, wo)
    out = torch.einsum("bckhw,ock->bohw", cols, weight.view(cout, cin, k))
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


class DCN_sep(nn.Module):
    """EDVR's DCN_sep (dcn/deform_conv.py): offsets/mask from a conv over a
    separate feature input; chunk(3) -> offset=cat(o1,o2), mask=sigmoid."""

    def __init__(self, nf, deformable_groups=8):
        super().__init__()
        self.gd = deformable_groups
        self.conv_offset_mask = nn.Conv2d(nf, 3 * deformable_groups * 9, 3, 1, 1)
        self.weight = nn.Parameter(torch.empty(nf, nf, 3, 3))
        self.bias = nn.Parameter(torch.zeros(nf))
        nn.init.kaiming_normal_(self.weight, a=0, mode="fan_in")
        nn.init.zeros_(self.conv_offset_mask.weight)
        nn.init.zeros_(self.conv_offset_mask.bias)

    def forward(self, x, fea):
        om = self.conv_offset_mask(fea)
        o1, o2, m = torch.chunk(om, 3, dim=1)
        offset = torch.cat((o1, o2), dim=1)
        mask = torch.sigmoid(m)
        return modulated_deform_conv(x, offset, mask, self.weight, self.bias,
                                     deformable_groups=self.gd)


# ------------------------------------------------------------------ shared
def lrelu(x):
    return F.leaky_relu(x, negative_slope=0.1)


class ResidualBlock_noBN(nn.Module):
    def __init__(self, nf=64):
        super().__init__()
        self.conv1 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.conv2 = nn.Conv2d(nf, nf, 3, 1, 1)

    def forward(self, x):
        return x + self.conv2(F.relu(self.conv1(x)))


def up2(x):
    return F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)


# -------------------------------------------------------------------- EDVR
class PCD_Align(nn.Module):
    def __init__(self, nf=64, groups=8):
        super().__init__()
        c = lambda i, o: nn.Conv2d(i, o, 3, 1, 1)  # noqa: E731
        self.L3_offset_conv1 = c(nf * 2, nf)
        self.L3_offset_conv2 = c(nf, nf)
        self.L3_dcnpack = DCN_sep(nf, groups)
        self.L2_offset_conv1 = c(nf * 2, nf)
        self.L2_offset_conv2 = c(nf * 2, nf)
        self.L2_offset_conv3 = c(nf, nf)
        self.L2_dcnpack = DCN_sep(nf, groups)
        self.L2_fea_conv = c(nf * 2, nf)
        self.L1_offset_conv1 = c(nf * 2, nf)
        self.L1_offset_conv2 = c(nf * 2, nf)
        self.L1_offset_conv3 = c(nf, nf)
        self.L1_dcnpack = DCN_sep(nf, groups)
        self.L1_fea_conv = c(nf * 2, nf)
        self.cas_offset_conv1 = c(nf * 2, nf)
        self.cas_offset_conv2 = c(nf, nf)
        self.cas_dcnpack = DCN_sep(nf, groups)

    def forward(self, nbr_fea_l, ref_fea_l):
        off = lrelu(self.L3_offset_conv1(torch.cat([nbr_fea_l[2], ref_fea_l[2]], 1)))
        off = lrelu(self.L3_offset_conv2(off))
        l3_fea = lrelu(self.L3_dcnpack(nbr_fea_l[2], off))
        l3_off_up = up2(off) * 2.0
        off = lrelu(self.L2_offset_conv1(torch.cat([nbr_fea_l[1], ref_fea_l[1]], 1)))
        off = lrelu(self.L2_offset_conv2(torch.cat([off, l3_off_up], 1)))
        off = lrelu(self.L2_offset_conv3(off))
        l2_fea = self.L2_dcnpack(nbr_fea_l[1], off)
        l2_fea = lrelu(self.L2_fea_conv(torch.cat([l2_fea, up2(l3_fea)], 1)))
        l2_off_up = up2(off) * 2.0
        off = lrelu(self.L1_offset_conv1(torch.cat([nbr_fea_l[0], ref_fea_l[0]], 1)))
        off = lrelu(self.L1_offset_conv2(torch.cat([off, l2_off_up], 1)))
        off = lrelu(self.L1_offset_conv3(off))
        l1_fea = self.L1_dcnpack(nbr_fea_l[0], off)
        l1_fea = self.L1_fea_conv(torch.cat([l1_fea, up2(l2_fea)], 1))
        off = lrelu(self.cas_offset_conv1(torch.cat([l1_fea, ref_fea_l[0]], 1)))
        off = lrelu(self.cas_offset_conv2(off))
        return lrelu(self.cas_dcnpack(l1_fea, off))


class TSA_Fusion(nn.Module):
    def __init__(self, nf=64, nframes=5, center=2):
        super().__init__()
        self.center = center
        self.tAtt_1 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.tAtt_2 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.fea_fusion = nn.Conv2d(nframes * nf, nf, 1)
        self.sAtt_1 = nn.Conv2d(nframes * nf, nf, 1)
        self.sAtt_2 = nn.Conv2d(nf * 2, nf, 3, 1, 1)
        self.sAtt_L1 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.sAtt_L2 = nn.Conv2d(nf * 2, nf, 3, 1, 1)
        self.sAtt_L3 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.sAtt_3 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.sAtt_4 = nn.Conv2d(nf, nf, 1)
        self.sAtt_5 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.sAtt_add_1 = nn.Conv2d(nf, nf, 1)
        self.sAtt_add_2 = nn.Conv2d(nf, nf, 1)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.avgpool = nn.AvgPool2d(3, stride=2, padding=1)

    def forward(self, aligned_fea):  # (B, N, C, H, W)
        b, n, c, h, w = aligned_fea.shape
        emb_ref = self.tAtt_2(aligned_fea[:, self.center])
        emb = self.tAtt_1(aligned_fea.reshape(b * n, c, h, w)).view(b, n, -1, h, w)
        cor = (emb * emb_ref.unsqueeze(1)).sum(2)  # (B, N, H, W)
        cor_prob = torch.sigmoid(cor).unsqueeze(2)
        fea = (aligned_fea * cor_prob).view(b, n * c, h, w)
        fused = lrelu(self.fea_fusion(fea))

        att = lrelu(self.sAtt_1(aligned_fea.view(b, n * c, h, w)))
        att = lrelu(self.sAtt_2(torch.cat([self.maxpool(att), self.avgpool(att)], 1)))
        att_l = lrelu(self.sAtt_L1(att))
        att_l = lrelu(self.sAtt_L2(
            torch.cat([self.maxpool(att_l), self.avgpool(att_l)], 1)))
        att_l = up2(lrelu(self.sAtt_L3(att_l)))
        att = lrelu(self.sAtt_3(att))
        att = att + att_l
        att = up2(lrelu(self.sAtt_4(att)))
        att = self.sAtt_5(att)
        att_add = self.sAtt_add_2(lrelu(self.sAtt_add_1(att)))
        att = torch.sigmoid(att)
        return fused * att * 2.0 + att_add


class Predeblur_ResNet_Pyramid(nn.Module):
    """EDVR_arch.Predeblur_ResNet_Pyramid (SURVEY.md §2.1 [H], detail [M]);
    mirrors dynavsr_tpu/models/edvr.py:PredeblurResNetPyramid name-for-name."""

    def __init__(self, nf=64, HR_in=False):
        super().__init__()
        self.HR_in = HR_in
        if HR_in:
            self.conv_first_1 = nn.Conv2d(3, nf, 3, 1, 1)
            self.conv_first_2 = nn.Conv2d(nf, nf, 3, 2, 1)
            self.conv_first_3 = nn.Conv2d(nf, nf, 3, 2, 1)
        else:
            self.conv_first = nn.Conv2d(3, nf, 3, 1, 1)
        for name in ("RB_L1_1", "RB_L1_2", "RB_L1_3", "RB_L1_4", "RB_L1_5",
                     "RB_L2_1", "RB_L2_2", "RB_L3_1"):
            setattr(self, name, ResidualBlock_noBN(nf))
        self.deblur_L2_conv = nn.Conv2d(nf, nf, 3, 2, 1)
        self.deblur_L3_conv = nn.Conv2d(nf, nf, 3, 2, 1)

    def forward(self, x):
        if self.HR_in:
            l1 = lrelu(self.conv_first_1(x))
            l1 = lrelu(self.conv_first_2(l1))
            l1 = lrelu(self.conv_first_3(l1))
        else:
            l1 = lrelu(self.conv_first(x))
        l2 = lrelu(self.deblur_L2_conv(l1))
        l3 = lrelu(self.deblur_L3_conv(l2))
        l3 = up2(self.RB_L3_1(l3))
        l2 = self.RB_L2_1(l2) + l3
        l2 = up2(self.RB_L2_2(l2))
        out = self.RB_L1_1(l1)
        out = self.RB_L1_2(out) + l2
        for rb in (self.RB_L1_3, self.RB_L1_4, self.RB_L1_5):
            out = rb(out)
        return out


class EDVR(nn.Module):
    def __init__(self, nf=64, nframes=5, groups=8, front_RBs=5, back_RBs=10,
                 center=None, w_TSA=True, predeblur=False, HR_in=False):
        super().__init__()
        self.center = center if center is not None else nframes // 2
        self.w_TSA = w_TSA
        self.predeblur = predeblur
        self.HR_in = HR_in
        if predeblur:
            self.pre_deblur = Predeblur_ResNet_Pyramid(nf, HR_in)
            self.conv_1x1 = nn.Conv2d(nf, nf, 1, 1, 0)
        elif HR_in:
            self.conv_first_1 = nn.Conv2d(3, nf, 3, 1, 1)
            self.conv_first_2 = nn.Conv2d(nf, nf, 3, 2, 1)
            self.conv_first_3 = nn.Conv2d(nf, nf, 3, 2, 1)
        else:
            self.conv_first = nn.Conv2d(3, nf, 3, 1, 1)
        self.feature_extraction = nn.Sequential(
            *[ResidualBlock_noBN(nf) for _ in range(front_RBs)])
        self.fea_L2_conv1 = nn.Conv2d(nf, nf, 3, 2, 1)
        self.fea_L2_conv2 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.fea_L3_conv1 = nn.Conv2d(nf, nf, 3, 2, 1)
        self.fea_L3_conv2 = nn.Conv2d(nf, nf, 3, 1, 1)
        self.pcd_align = PCD_Align(nf, groups)
        if w_TSA:
            self.tsa_fusion = TSA_Fusion(nf, nframes, self.center)
        else:
            self.tsa_fusion = nn.Conv2d(nframes * nf, nf, 1)
        self.recon_trunk = nn.Sequential(
            *[ResidualBlock_noBN(nf) for _ in range(back_RBs)])
        self.upconv1 = nn.Conv2d(nf, nf * 4, 3, 1, 1)
        self.upconv2 = nn.Conv2d(nf, 64 * 4, 3, 1, 1)
        self.HRconv = nn.Conv2d(64, 64, 3, 1, 1)
        self.conv_last = nn.Conv2d(64, 3, 3, 1, 1)
        self.ps = nn.PixelShuffle(2)

    def forward(self, x):  # (B, N, 3, H, W)
        b, n, c, h, w = x.shape
        x_center = x[:, self.center]
        xf = x.view(b * n, c, h, w)
        if self.predeblur:
            l1 = self.conv_1x1(self.pre_deblur(xf))
            if self.HR_in:
                h, w = h // 4, w // 4
        elif self.HR_in:
            l1 = lrelu(self.conv_first_1(xf))
            l1 = lrelu(self.conv_first_2(l1))
            l1 = lrelu(self.conv_first_3(l1))
            h, w = h // 4, w // 4
        else:
            l1 = lrelu(self.conv_first(xf))
        l1 = self.feature_extraction(l1)
        l2 = lrelu(self.fea_L2_conv2(lrelu(self.fea_L2_conv1(l1))))
        l3 = lrelu(self.fea_L3_conv2(lrelu(self.fea_L3_conv1(l2))))
        l1 = l1.view(b, n, -1, h, w)
        l2 = l2.view(b, n, -1, h // 2, w // 2)
        l3 = l3.view(b, n, -1, h // 4, w // 4)
        ref = [l1[:, self.center], l2[:, self.center], l3[:, self.center]]
        aligned = torch.stack(
            [self.pcd_align([l1[:, i], l2[:, i], l3[:, i]], ref) for i in range(n)],
            dim=1)
        if self.w_TSA:
            fea = self.tsa_fusion(aligned)
        else:
            fea = self.tsa_fusion(aligned.view(b, -1, h, w))
        out = self.recon_trunk(fea)
        out = lrelu(self.ps(self.upconv1(out)))
        out = lrelu(self.ps(self.upconv2(out)))
        out = self.conv_last(lrelu(self.HRconv(out)))
        if self.HR_in:
            base = x_center
        else:
            base = F.interpolate(x_center, scale_factor=4, mode="bilinear",
                                 align_corners=False)
        return out + base


# --------------------------------------------------------------------- TOF
def flow_warp(x, flow):
    """torch flow warp — grid_sample(bilinear, zeros, align_corners=True),
    flow channels (dx, dy) (reference arch_util.flow_warp)."""
    b, c, h, w = x.shape
    gy, gx = torch.meshgrid(torch.arange(h, dtype=x.dtype),
                            torch.arange(w, dtype=x.dtype), indexing="ij")
    vx = gx.unsqueeze(0) + flow[:, 0]
    vy = gy.unsqueeze(0) + flow[:, 1]
    nx = 2.0 * vx / max(w - 1, 1) - 1.0
    ny = 2.0 * vy / max(h - 1, 1) - 1.0
    grid = torch.stack((nx, ny), dim=3)
    return F.grid_sample(x, grid, mode="bilinear", padding_mode="zeros",
                         align_corners=True)


class SpyNetBlock(nn.Module):
    def __init__(self):
        super().__init__()
        widths = (32, 64, 32, 16)
        cin = 8
        for i, f in enumerate(widths):
            setattr(self, f"conv{i}", nn.Conv2d(cin, f, 7, 1, 3))
            setattr(self, f"bn{i}", nn.BatchNorm2d(f, eps=1e-5))
            cin = f
        self.conv4 = nn.Conv2d(cin, 2, 7, 1, 3)

    def forward(self, x):
        for i in range(4):
            x = F.relu(getattr(self, f"bn{i}")(getattr(self, f"conv{i}")(x)))
        return self.conv4(x)


class SpyNet(nn.Module):
    def __init__(self, levels=4):
        super().__init__()
        self.levels = levels
        for lvl in range(levels):
            setattr(self, f"block{lvl}", SpyNetBlock())

    def forward(self, ref, nbr):
        refs, nbrs = [ref], [nbr]
        for _ in range(self.levels - 1):
            refs.insert(0, F.avg_pool2d(refs[0], 2))
            nbrs.insert(0, F.avg_pool2d(nbrs[0], 2))
        b, _, h0, w0 = refs[0].shape
        flow = torch.zeros(b, 2, h0, w0, dtype=ref.dtype)
        for lvl in range(self.levels):
            if lvl > 0:
                flow = up2(flow) * 2.0
            warped = flow_warp(nbrs[lvl], flow)
            inp = torch.cat([refs[lvl], warped, flow], dim=1)
            flow = flow + getattr(self, f"block{lvl}")(inp)
        return flow


class TOFlow(nn.Module):
    _MEAN = (0.485, 0.456, 0.406)
    _STD = (0.229, 0.224, 0.225)

    def __init__(self):
        super().__init__()
        self.spynet = SpyNet()
        self.conv_3x7_64_9x9 = nn.Conv2d(7 * 3, 64, 9, 1, 4)
        self.conv_64_64_9x9 = nn.Conv2d(64, 64, 9, 1, 4)
        self.conv_64_64_1x1 = nn.Conv2d(64, 64, 1)
        self.conv_64_3_1x1 = nn.Conv2d(64, 3, 1)

    def forward(self, x):  # (B, T, 3, H, W), pre-upscaled
        b, t, c, h, w = x.shape
        center = t // 2
        mean = torch.tensor(self._MEAN, dtype=x.dtype).view(1, 1, 3, 1, 1)
        std = torch.tensor(self._STD, dtype=x.dtype).view(1, 1, 3, 1, 1)
        xn = (x - mean) / std
        ref = xn[:, center]
        warped = []
        for i in range(t):
            if i == center:
                warped.append(ref)
            else:
                flow = self.spynet(ref, xn[:, i])
                warped.append(flow_warp(xn[:, i], flow))
        fused = torch.stack(warped, dim=1).view(b, t * c, h, w)
        y = F.relu(self.conv_3x7_64_9x9(fused))
        y = F.relu(self.conv_64_64_9x9(y))
        y = F.relu(self.conv_64_64_1x1(y))
        y = self.conv_64_3_1x1(y)
        out = y + ref
        return out * std.view(1, 3, 1, 1) + mean.view(1, 3, 1, 1)


# --------------------------------------------------------------------- DUF
class DenseLayer(nn.Module):
    def __init__(self, cin, growth=32, t_valid=False):
        super().__init__()
        self.t_valid = t_valid
        self.bn1 = nn.BatchNorm3d(cin, eps=1e-5)
        self.conv1 = nn.Conv3d(cin, cin, 1)
        self.bn2 = nn.BatchNorm3d(cin, eps=1e-5)
        pad_t = 0 if t_valid else 1
        self.conv2 = nn.Conv3d(cin, growth, 3, 1, (pad_t, 1, 1))

    def forward(self, x):  # (B, C, T, H, W)
        y = self.conv1(F.relu(self.bn1(x)))
        y = self.conv2(F.relu(self.bn2(y)))
        if self.t_valid:
            x = x[:, :, 1:-1]
        return torch.cat([x, y], dim=1)


def dynamic_upsampling_filter(x, filters):
    """x: (B, 3, H, W); filters: (B, H, W, 25, R) softmaxed. Output channel
    order c*R + r (matches flax dynamic_upsampling_filter)."""
    b, c, h, w = x.shape
    xp = F.pad(x, (2, 2, 2, 2))
    patches = torch.stack(
        [xp[:, :, i : i + h, j : j + w] for i in range(5) for j in range(5)],
        dim=2)  # (B, C, 25, H, W)
    out = torch.einsum("bckhw,bhwkr->bcrhw", patches, filters)
    return out.reshape(b, c * filters.shape[-1], h, w)


class DUF(nn.Module):
    def __init__(self, scale=4, dense1_layers=3, growth=32):
        super().__init__()
        self.scale = scale
        r2 = scale * scale
        self.conv3d_1 = nn.Conv3d(3, 64, (1, 3, 3), 1, (0, 1, 1))
        cin = 64
        for i in range(dense1_layers):
            setattr(self, f"dense1_{i}", DenseLayer(cin, growth, False))
            cin += growth
        for i in range(3):
            setattr(self, f"dense2_{i}", DenseLayer(cin, growth, True))
            cin += growth
        self.dense1_layers = dense1_layers
        self.bn3d_2 = nn.BatchNorm3d(cin, eps=1e-5)
        self.conv3d_2 = nn.Conv3d(cin, 256, (1, 3, 3), 1, (0, 1, 1))
        self.conv3d_r1 = nn.Conv3d(256, 256, 1)
        self.conv3d_r2 = nn.Conv3d(256, 3 * r2, 1)
        self.conv3d_f1 = nn.Conv3d(256, 512, 1)
        self.conv3d_f2 = nn.Conv3d(512, 25 * r2, 1)
        self.ps = nn.PixelShuffle(scale)

    def forward(self, x):  # (B, T, 3, H, W)
        b, t, c, h, w = x.shape
        r2 = self.scale ** 2
        x_center = x[:, t // 2]
        fea = self.conv3d_1(x.permute(0, 2, 1, 3, 4))  # (B, C, T, H, W)
        for i in range(self.dense1_layers):
            fea = getattr(self, f"dense1_{i}")(fea)
        for i in range(3):
            fea = getattr(self, f"dense2_{i}")(fea)
        fea = F.relu(self.conv3d_2(F.relu(self.bn3d_2(fea))))
        res = self.conv3d_r2(F.relu(self.conv3d_r1(fea)))[:, :, 0]
        filt = self.conv3d_f2(F.relu(self.conv3d_f1(fea)))[:, :, 0]
        filt = F.softmax(filt.view(b, 25, r2, h, w), dim=1)
        filt = filt.permute(0, 3, 4, 1, 2)  # (B, H, W, 25, R)
        out = dynamic_upsampling_filter(x_center, filt) + res
        return self.ps(out)
