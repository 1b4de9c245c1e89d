"""Independent torch re-implementation of the U-Net architecture spec,
used ONLY as a test oracle for the JAX model and the checkpoint converter.

Built from the architecture contract documented in
``iterseg_tpu/models/unet.py`` (itself derived from the reference survey):
state-dict keys must match the reference layout exactly so that converted
checkpoints load 1:1.
"""
import torch
import torch.nn as nn


class TorchConvModule(nn.Module):
    def __init__(self, cin, cout, final="relu"):
        super().__init__()
        self.conv0 = nn.Conv3d(cin, cout, 3, 1, 1)
        self.conv1 = nn.Conv3d(cout, cout, 3, 1, 1)
        self.batch0 = nn.BatchNorm3d(cout)
        self.batch1 = nn.BatchNorm3d(cout)
        self.final = final

    def forward(self, x):
        x = torch.relu(self.batch0(self.conv0(x)))
        x = self.batch1(self.conv1(x))
        if self.final == "relu":
            return torch.relu(x)
        if self.final == "sigmoid":
            return torch.sigmoid(x)
        if self.final == "tanh":
            return torch.tanh(x)
        if self.final == "softmax":
            return torch.softmax(x, dim=1)
        raise ValueError(self.final)


class TorchUNetRef(nn.Module):
    def __init__(self, in_channels=1, out_channels=5, finals=None):
        super().__init__()
        forked = isinstance(out_channels, tuple)
        self.out_channels = out_channels if forked else (out_channels,)
        df, nd = (1, 2, 2), (2, 2, 2)
        self.d0 = nn.MaxPool3d(df, stride=df, padding=(0, 1, 1))
        self.d1 = nn.MaxPool3d(df, stride=df, padding=(0, 1, 1))
        self.d2 = nn.MaxPool3d(df, stride=df, padding=(0, 1, 1))
        self.d3 = nn.MaxPool3d(nd, stride=nd, padding=(0, 1, 1))
        self.c0 = TorchConvModule(in_channels, 32)
        self.c1 = TorchConvModule(32, 64)
        self.c2 = TorchConvModule(64, 128)
        self.c3 = TorchConvModule(128, 256)
        self.c4 = TorchConvModule(256, 256)
        for i, c in enumerate(self.out_channels):
            setattr(self, f"c5_{i}", TorchConvModule(512, 128))
            setattr(self, f"c6_{i}", TorchConvModule(256, 64))
            setattr(self, f"c7_{i}", TorchConvModule(128, 32))
            final = finals[i] if finals is not None else "sigmoid"
            setattr(self, f"c8_{i}", TorchConvModule(64, c, final=final))
        self.up0 = nn.ConvTranspose3d(256, 256, nd, stride=nd, groups=256)
        self.up1 = nn.ConvTranspose3d(128, 128, df, stride=df, groups=128)
        self.up2 = nn.ConvTranspose3d(64, 64, df, stride=df, groups=64)
        self.up3 = nn.ConvTranspose3d(32, 32, df, stride=df, groups=32)

    def decode(self, x, c0, c1, c2, c3, i):
        x = self.up0(x)[:, :, :, :-1, :-1]
        x = getattr(self, f"c5_{i}")(torch.cat([x, c3], 1))
        x = self.up1(x)[:, :, :, :-1, :-1]
        x = getattr(self, f"c6_{i}")(torch.cat([x, c2], 1))
        x = self.up2(x)[:, :, :, :-1, :-1]
        x = getattr(self, f"c7_{i}")(torch.cat([x, c1], 1))
        x = self.up3(x)[:, :, :, 1:-1, 1:-1]
        x = getattr(self, f"c8_{i}")(torch.cat([x, c0], 1))
        return x

    def forward(self, x):
        c0 = self.c0(x)
        c1 = self.c1(self.d0(c0))
        c2 = self.c2(self.d1(c1))
        c3 = self.c3(self.d2(c2))
        x = self.c4(self.d3(c3))
        outs = [
            self.decode(x, c0, c1, c2, c3, i)
            for i in range(len(self.out_channels))
        ]
        return outs[0] if len(outs) == 1 else torch.cat(outs, 1)
