"""Torch fixture models for checkpoint-conversion parity tests.

These re-state the reference architectures (reference: ``models/DispNetS.py``,
``models/PoseExpNet.py``, torchvision ResNet BasicBlock) in torch so we can
verify that convert_* maps weights such that flax forward == torch forward.
They are test fixtures of this repo, not copies — written from the
architecture spec in SURVEY.md §2.2.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


def downsample_conv(in_planes, out_planes, kernel_size=3):
    return nn.Sequential(
        nn.Conv2d(in_planes, out_planes, kernel_size, stride=2,
                  padding=(kernel_size - 1) // 2),
        nn.ELU(inplace=True),
        nn.Conv2d(out_planes, out_planes, kernel_size, padding=(kernel_size - 1) // 2),
        nn.ELU(inplace=True),
    )


def conv_elu(in_planes, out_planes):
    return nn.Sequential(
        nn.Conv2d(in_planes, out_planes, 3, padding=1), nn.ELU(inplace=True)
    )


def upconv(in_planes, out_planes):
    return nn.Sequential(
        nn.ConvTranspose2d(in_planes, out_planes, 3, stride=2, padding=1,
                           output_padding=1),
        nn.ELU(inplace=True),
    )


def predict_disp(in_planes):
    return nn.Sequential(nn.Conv2d(in_planes, 1, 3, padding=1), nn.Sigmoid())


def crop_like(x, ref):
    return x[:, :, : ref.size(2), : ref.size(3)]


class TorchDispNetS(nn.Module):
    def __init__(self, alpha=10.0, beta=0.01):
        super().__init__()
        self.alpha, self.beta = alpha, beta
        cp = [32, 64, 128, 256, 512, 512, 512]
        self.conv1 = downsample_conv(3, cp[0], 7)
        self.conv2 = downsample_conv(cp[0], cp[1], 5)
        self.conv3 = downsample_conv(cp[1], cp[2])
        self.conv4 = downsample_conv(cp[2], cp[3])
        self.conv5 = downsample_conv(cp[3], cp[4])
        self.conv6 = downsample_conv(cp[4], cp[5])
        self.conv7 = downsample_conv(cp[5], cp[6])

        up = [512, 512, 256, 128, 64, 32, 16]
        self.upconv7 = upconv(cp[6], up[0])
        self.upconv6 = upconv(up[0], up[1])
        self.upconv5 = upconv(up[1], up[2])
        self.upconv4 = upconv(up[2], up[3])
        self.upconv3 = upconv(up[3], up[4])
        self.upconv2 = upconv(up[4], up[5])
        self.upconv1 = upconv(up[5], up[6])

        self.iconv7 = conv_elu(up[0] + cp[5], up[0])
        self.iconv6 = conv_elu(up[1] + cp[4], up[1])
        self.iconv5 = conv_elu(up[2] + cp[3], up[2])
        self.iconv4 = conv_elu(up[3] + cp[2], up[3])
        self.iconv3 = conv_elu(1 + up[4] + cp[1], up[4])
        self.iconv2 = conv_elu(1 + up[5] + cp[0], up[5])
        self.iconv1 = conv_elu(1 + up[6], up[6])

        self.predict_disp4 = predict_disp(up[3])
        self.predict_disp3 = predict_disp(up[4])
        self.predict_disp2 = predict_disp(up[5])
        self.predict_disp1 = predict_disp(up[6])

    def forward(self, x):
        c1 = self.conv1(x)
        c2 = self.conv2(c1)
        c3 = self.conv3(c2)
        c4 = self.conv4(c3)
        c5 = self.conv5(c4)
        c6 = self.conv6(c5)
        c7 = self.conv7(c6)

        u7 = crop_like(self.upconv7(c7), c6)
        i7 = self.iconv7(torch.cat((u7, c6), 1))
        u6 = crop_like(self.upconv6(i7), c5)
        i6 = self.iconv6(torch.cat((u6, c5), 1))
        u5 = crop_like(self.upconv5(i6), c4)
        i5 = self.iconv5(torch.cat((u5, c4), 1))
        u4 = crop_like(self.upconv4(i5), c3)
        i4 = self.iconv4(torch.cat((u4, c3), 1))
        disp4 = self.alpha * self.predict_disp4(i4) + self.beta

        u3 = crop_like(self.upconv3(i4), c2)
        d4u = crop_like(F.interpolate(disp4, scale_factor=2, mode="bilinear",
                                      align_corners=False), c2)
        i3 = self.iconv3(torch.cat((u3, c2, d4u), 1))
        disp3 = self.alpha * self.predict_disp3(i3) + self.beta

        u2 = crop_like(self.upconv2(i3), c1)
        d3u = crop_like(F.interpolate(disp3, scale_factor=2, mode="bilinear",
                                      align_corners=False), c1)
        i2 = self.iconv2(torch.cat((u2, c1, d3u), 1))
        disp2 = self.alpha * self.predict_disp2(i2) + self.beta

        u1 = crop_like(self.upconv1(i2), x)
        d2u = crop_like(F.interpolate(disp2, scale_factor=2, mode="bilinear",
                                      align_corners=False), x)
        i1 = self.iconv1(torch.cat((u1, d2u), 1))
        disp1 = self.alpha * self.predict_disp1(i1) + self.beta
        return disp1, disp2, disp3, disp4


class TorchPoseExpNet(nn.Module):
    def __init__(self, nb_ref_imgs=2, output_exp=True):
        super().__init__()
        self.nb_ref_imgs = nb_ref_imgs
        self.output_exp = output_exp
        cp = [16, 32, 64, 128, 256, 256, 256]

        def c(i, o, k):
            return nn.Sequential(
                nn.Conv2d(i, o, k, stride=2, padding=(k - 1) // 2), nn.ELU(inplace=True)
            )

        self.conv1 = c(3 * (1 + nb_ref_imgs), cp[0], 7)
        self.conv2 = c(cp[0], cp[1], 5)
        self.conv3 = c(cp[1], cp[2], 3)
        self.conv4 = c(cp[2], cp[3], 3)
        self.conv5 = c(cp[3], cp[4], 3)
        self.conv6 = c(cp[4], cp[5], 3)
        self.conv7 = c(cp[5], cp[6], 3)
        self.pose_pred = nn.Conv2d(cp[6], 6 * nb_ref_imgs, 1)
        if output_exp:
            up = [256, 128, 64, 32, 16]
            self.upconv5 = upconv(cp[4], up[0])
            self.upconv4 = upconv(up[0], up[1])
            self.upconv3 = upconv(up[1], up[2])
            self.upconv2 = upconv(up[2], up[3])
            self.upconv1 = upconv(up[3], up[4])
            self.predict_mask4 = nn.Conv2d(up[1], nb_ref_imgs, 3, padding=1)
            self.predict_mask3 = nn.Conv2d(up[2], nb_ref_imgs, 3, padding=1)
            self.predict_mask2 = nn.Conv2d(up[3], nb_ref_imgs, 3, padding=1)
            self.predict_mask1 = nn.Conv2d(up[4], nb_ref_imgs, 3, padding=1)

    def forward(self, tgt, refs):
        x = torch.cat([tgt] + refs, 1)
        c1 = self.conv1(x)
        c2 = self.conv2(c1)
        c3 = self.conv3(c2)
        c4 = self.conv4(c3)
        c5 = self.conv5(c4)
        c6 = self.conv6(c5)
        c7 = self.conv7(c6)
        pose = self.pose_pred(c7).mean(3).mean(2) * 0.01
        pose = pose.view(pose.size(0), self.nb_ref_imgs, 6)
        if not self.output_exp:
            return None, pose
        u5 = crop_like(self.upconv5(c5), c4)
        u4 = crop_like(self.upconv4(u5), c3)
        e4 = torch.sigmoid(self.predict_mask4(u4))
        u3 = crop_like(self.upconv3(u4), c2)
        e3 = torch.sigmoid(self.predict_mask3(u3))
        u2 = crop_like(self.upconv2(u3), c1)
        e2 = torch.sigmoid(self.predict_mask2(u2))
        u1 = crop_like(self.upconv1(u2), tgt)
        e1 = torch.sigmoid(self.predict_mask1(u1))
        return [e1, e2, e3, e4], pose


class TorchBasicBlock(nn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes),
            )

    def forward(self, x):
        identity = self.downsample(x) if self.downsample else x
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + identity)


class TorchBottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1, expansion=4):
        super().__init__()
        out_ch = planes * expansion
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, out_ch, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch)
        self.downsample = None
        if stride != 1 or inplanes != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, out_ch, 1, stride, bias=False),
                nn.BatchNorm2d(out_ch),
            )

    def forward(self, x):
        identity = self.downsample(x) if self.downsample else x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + identity)


_RESNET_STAGES = {18: (TorchBasicBlock, (2, 2, 2, 2)),
                  50: (TorchBottleneck, (3, 4, 6, 3))}


class TorchResNetEncoder(nn.Module):
    """torchvision-layout ResNet-18/50 feature extractor (5 feature maps)."""

    def __init__(self, depth=18):
        super().__init__()
        block_cls, stage_sizes = _RESNET_STAGES[depth]
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        layers = []
        inplanes = 64
        for stage, planes in enumerate([64, 128, 256, 512]):
            blocks = []
            for b in range(stage_sizes[stage]):
                stride = 2 if (b == 0 and stage > 0) else 1
                blocks.append(block_cls(inplanes, planes, stride))
                inplanes = planes * (4 if block_cls is TorchBottleneck else 1)
            layers.append(nn.Sequential(*blocks))
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

    def forward(self, x):
        feats = []
        x = F.relu(self.bn1(self.conv1(x)))
        feats.append(x)
        x = self.maxpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
            feats.append(x)
        return feats


# backward-compat alias used by older tests
class TorchResNet18Encoder(TorchResNetEncoder):
    def __init__(self):
        super().__init__(depth=18)


_DEC_PLANES = (16, 32, 64, 128, 256)


class TorchDispResNet(nn.Module):
    """Reference DispResNet layout: ResNet encoder + upconv/iconv decoder
    with skip-concat and bilinear upsampling, multi-scale disparity heads or
    a classification bin-logit head (default converter name map:
    upconvN.0 / iconvN.0 / predict_dispN.0 / predict_class.0)."""

    def __init__(self, depth=18, head="disp", num_bins=64,
                 alpha=10.0, beta=0.01):
        super().__init__()
        self.head, self.alpha, self.beta = head, alpha, beta
        self.encoder = TorchResNetEncoder(depth)
        enc_ch = ([64, 64, 128, 256, 512] if depth == 18
                  else [64, 256, 512, 1024, 2048])
        for i in range(4, -1, -1):
            in_ch = enc_ch[4] if i == 4 else _DEC_PLANES[i + 1]
            setattr(self, f"upconv{i}",
                    nn.Sequential(nn.Conv2d(in_ch, _DEC_PLANES[i], 3, padding=1)))
            cat_ch = _DEC_PLANES[i] + (enc_ch[i - 1] if i > 0 else 0)
            setattr(self, f"iconv{i}",
                    nn.Sequential(nn.Conv2d(cat_ch, _DEC_PLANES[i], 3, padding=1)))
        if head == "classification":
            self.predict_class = nn.Sequential(
                nn.Conv2d(_DEC_PLANES[0], num_bins, 3, padding=1))
        else:
            for s in range(1, 5):
                setattr(self, f"predict_disp{s}",
                        nn.Sequential(nn.Conv2d(_DEC_PLANES[s - 1], 1, 3, padding=1)))

    def forward(self, x):
        enc = self.encoder(x)
        feats = {}
        h = enc[-1]
        for i in range(4, -1, -1):
            h = F.elu(getattr(self, f"upconv{i}")(h))
            if i > 0:
                skip = enc[i - 1]
                h = F.interpolate(h, size=skip.shape[2:], mode="bilinear",
                                  align_corners=False)
                h = torch.cat([h, skip], 1)
            else:
                h = F.interpolate(h, size=x.shape[2:], mode="bilinear",
                                  align_corners=False)
            h = F.elu(getattr(self, f"iconv{i}")(h))
            feats[i] = h
        if self.head == "classification":
            return self.predict_class(feats[0])
        return [self.alpha * torch.sigmoid(
                    getattr(self, f"predict_disp{s + 1}")(feats[s])) + self.beta
                for s in range(4)]


_VGG16_STAGES = ((64, 64), (128, 128), (256, 256, 256),
                 (512, 512, 512), (512, 512, 512))


class TorchDispVggBN(nn.Module):
    """VGG16-BN disparity net: torchvision ``features`` numbering under
    ``encoder.features``, upconv/iconv decoder, 4 disparity heads."""

    def __init__(self, alpha=10.0, beta=0.01):
        super().__init__()
        self.alpha, self.beta = alpha, beta
        feats: list[nn.Module] = []
        in_ch = 3
        for widths in _VGG16_STAGES:
            for w in widths:
                feats += [nn.Conv2d(in_ch, w, 3, padding=1),
                          nn.BatchNorm2d(w), nn.ReLU(inplace=True)]
                in_ch = w
            feats.append(nn.MaxPool2d(2, 2))
        self.encoder = nn.Module()
        self.encoder.features = nn.Sequential(*feats)
        enc_ch = [64, 128, 256, 512, 512]
        for k in range(4, -1, -1):
            in_ch = 512 if k == 4 else _DEC_PLANES[k + 1]
            setattr(self, f"upconv{k}",
                    nn.Sequential(nn.Conv2d(in_ch, _DEC_PLANES[k], 3, padding=1)))
            setattr(self, f"iconv{k}",
                    nn.Sequential(nn.Conv2d(_DEC_PLANES[k] + enc_ch[k], _DEC_PLANES[k],
                                            3, padding=1)))
        for s in range(1, 5):
            setattr(self, f"predict_disp{s}",
                    nn.Sequential(nn.Conv2d(_DEC_PLANES[s - 1], 1, 3, padding=1)))

    def forward(self, x):
        feats = []
        h = x
        for layer in self.encoder.features:
            if isinstance(layer, nn.MaxPool2d):
                feats.append(h)  # pre-pool, strides 1, 2, 4, 8, 16
            h = layer(h)
        outs = []
        for k in range(4, -1, -1):
            skip = feats[k]
            h = F.elu(getattr(self, f"upconv{k}")(h))
            h = F.interpolate(h, size=skip.shape[2:], mode="bilinear",
                              align_corners=False)
            h = torch.cat([h, skip], 1)
            h = F.elu(getattr(self, f"iconv{k}")(h))
            outs.append(h)  # after up4, up3 (=d4), up2 (=d3), up1 (=d2), up0 (=d1)
        d4, d3, d2, d1 = outs[1], outs[2], outs[3], outs[4]
        return [self.alpha * torch.sigmoid(getattr(self, f"predict_disp{s + 1}")(d))
                + self.beta for s, d in enumerate((d1, d2, d3, d4))]


def _unpool2x(x):
    """Laina unpooling: zero-stuff so x lands at even coordinates."""
    B, C, H, W = x.shape
    out = x.new_zeros(B, C, 2 * H, 2 * W)
    out[:, :, ::2, ::2] = x
    return out


class TorchUpProj(nn.Module):
    """Laina up-projection: unpool -> two conv branches, residual ReLU."""

    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 5, padding=2)
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.bn2 = nn.BatchNorm2d(out_ch)
        self.conv3 = nn.Conv2d(in_ch, out_ch, 5, padding=2)
        self.bn3 = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        h = _unpool2x(x)
        a = self.bn2(self.conv2(F.relu(self.bn1(self.conv1(h)))))
        b = self.bn3(self.conv3(h))
        return F.relu(a + b)


class TorchFCRN(nn.Module):
    """Laina FCRN: ResNet-50 encoder, 1x1 bottleneck reduction, 4
    up-projections, direct metric-depth head."""

    def __init__(self):
        super().__init__()
        self.encoder = TorchResNetEncoder(50)
        self.conv2 = nn.Conv2d(2048, 1024, 1)
        self.bn2 = nn.BatchNorm2d(1024)
        ch = 1024
        for n in range(1, 5):
            setattr(self, f"up{n}", TorchUpProj(ch, ch // 2))
            ch //= 2
        self.conv3 = nn.Conv2d(ch, 1, 3, padding=1)

    def forward(self, x):
        h = self.encoder(x)[-1]
        h = self.bn2(self.conv2(h))
        for n in range(1, 5):
            h = getattr(self, f"up{n}")(h)
        h = F.relu(self.conv3(h))
        return F.interpolate(h, size=x.shape[2:], mode="bilinear",
                             align_corners=False)
