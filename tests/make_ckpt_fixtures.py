"""Generate torch-side checkpoint-import fixtures (run where torch exists):
real .pth files + expected activations as npz, so test_ckpt_import asserts
bit-level import parity even in torch-free environments."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FIXTURES = Path(__file__).resolve().parent / "fixtures"


def make_roundtrip():
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    m = nn.Sequential(nn.Conv2d(3, 8, 3), nn.BatchNorm2d(8), nn.Linear(4, 5))
    t = torch.randn(4, 6)
    sd = {"model_state": m.state_dict(), "epoch": 3, "it": 11,
          "version": "pcdet+0.6", "half": t.half(), "bf16": t.bfloat16(),
          "noncontig": t.t()}
    torch.save(sd, str(FIXTURES / "roundtrip.pth"))
    np.savez(
        FIXTURES / "roundtrip_expected.npz",
        half=t.half().float().numpy(), bf16=t.bfloat16().float().numpy(),
        noncontig=t.t().numpy(),
        **{f"model_state/{k}": v.numpy() for k, v in m.state_dict().items()},
    )


def make_bev():
    import torch
    import torch.nn as nn

    torch.manual_seed(1)
    cfg = {"LAYER_NUMS": [2, 2], "LAYER_STRIDES": [1, 2],
           "NUM_FILTERS": [16, 32], "UPSAMPLE_STRIDES": [1, 2],
           "NUM_UPSAMPLE_FILTERS": [16, 16],
           "USE_CONV_FOR_NO_STRIDE": True}
    cin = 24
    blocks, deblocks = nn.ModuleList(), nn.ModuleList()
    c_in_list = [cin, 16]
    for i, n in enumerate(cfg["LAYER_NUMS"]):
        layers = [nn.ZeroPad2d(1),
                  nn.Conv2d(c_in_list[i], cfg["NUM_FILTERS"][i], 3,
                            stride=cfg["LAYER_STRIDES"][i], bias=False),
                  nn.BatchNorm2d(cfg["NUM_FILTERS"][i], eps=1e-3,
                                 momentum=0.01),
                  nn.ReLU()]
        for _ in range(n):
            layers += [nn.Conv2d(cfg["NUM_FILTERS"][i], cfg["NUM_FILTERS"][i],
                                 3, padding=1, bias=False),
                       nn.BatchNorm2d(cfg["NUM_FILTERS"][i], eps=1e-3,
                                      momentum=0.01),
                       nn.ReLU()]
        blocks.append(nn.Sequential(*layers))
        s = cfg["UPSAMPLE_STRIDES"][i]
        up = nn.ConvTranspose2d(cfg["NUM_FILTERS"][i],
                                cfg["NUM_UPSAMPLE_FILTERS"][i], s, stride=s,
                                bias=False)
        deblocks.append(nn.Sequential(
            up, nn.BatchNorm2d(cfg["NUM_UPSAMPLE_FILTERS"][i], eps=1e-3,
                               momentum=0.01), nn.ReLU()))

    class Ref(nn.Module):
        def __init__(self):
            super().__init__()
            self.blocks = blocks
            self.deblocks = deblocks

        def forward(self, x):
            ups = []
            for i in range(len(self.blocks)):
                x = self.blocks[i](x)
                ups.append(self.deblocks[i](x))
            return torch.cat(ups, dim=1)

    ref = Ref().eval()
    for m in ref.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    sd = {f"backbone_2d.{k}": v for k, v in ref.state_dict().items()}
    torch.save({"model_state": sd}, str(FIXTURES / "bev.pth"))

    x_np = np.random.RandomState(0).randn(1, 16, 16, cin).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x_np).permute(0, 3, 1, 2))
    np.savez(FIXTURES / "bev_expected.npz",
             x=x_np, want=want.permute(0, 2, 3, 1).numpy())


def make_mha():
    import torch
    import torch.nn as nn

    torch.manual_seed(2)
    d, h = 32, 4
    mha = nn.MultiheadAttention(d, h, dropout=0.0).eval()
    q = torch.randn(5, 2, d)
    k = torch.randn(7, 2, d)
    with torch.no_grad():
        want, _ = mha(q, k, k)
    np.savez(
        FIXTURES / "mha.npz",
        in_proj_weight=mha.in_proj_weight.detach().numpy(),
        in_proj_bias=mha.in_proj_bias.detach().numpy(),
        out_w=mha.out_proj.weight.detach().numpy(),
        out_b=mha.out_proj.bias.detach().numpy(),
        q=q.permute(1, 0, 2).numpy(), k=k.permute(1, 0, 2).numpy(),
        want=want.permute(1, 0, 2).numpy(), num_heads=h,
    )


if __name__ == "__main__":
    FIXTURES.mkdir(exist_ok=True)
    make_roundtrip()
    make_bev()
    make_mha()
    print("fixtures written to", FIXTURES)
