"""Independent torch restatement of the GEM mechanism (Bousselham et al.,
CVPR 2024) on TinyCLIP, used as a numeric oracle for
hybridgl_tpu/models/gem/gem.py.

The reference consumes the external ``gem-torch`` pip package (absent
here); both this file and the JAX module were written from the paper, so
this cross-check validates the JAX implementation mechanics (qkv layout,
self-self ensemble, stream bookkeeping, pos-embed interpolation) rather
than parity with the pip package itself.
"""

import torch
import torch.nn.functional as F


def _split_heads(t, heads):
    N, L, D = t.shape
    return t.reshape(N, L, heads, D // heads).transpose(1, 2)


@torch.no_grad()
def torch_gem_features(model, images, depth, iters, temp=None):
    """images: [N, 3, S, S] normalized -> (patch_feats [N, G*G, E], cls [N, E])."""
    cfg = model.cfg
    x = model.v_conv1(images)  # [N, D, G, G]
    N, D, G, _ = x.shape
    x = x.reshape(N, D, G * G).permute(0, 2, 1)
    cls = model.v_class + torch.zeros(N, 1, D)
    x = torch.cat([cls, x], dim=1)

    pos = model.v_pos
    cls_p, patch_p = pos[:1], pos[1:]
    g0 = int(round(patch_p.shape[0] ** 0.5))
    pp = patch_p.reshape(g0, g0, D).permute(2, 0, 1)[None]
    up = F.interpolate(pp, (G, G), mode="bilinear", align_corners=False)
    pos_new = torch.cat([cls_p, up[0].permute(1, 2, 0).reshape(G * G, D)], dim=0)
    x = model.v_ln_pre(x + pos_new)

    heads = cfg.vision_heads
    hd = D // heads
    if temp is None:
        temp = hd**-0.5
    scale = hd**-0.5
    gem_start = cfg.vision_layers - depth
    x_gem = None

    for i, b in enumerate(model.v_tr.resblocks):
        y = b.ln_1(x)
        qkv = y @ b.attn.in_proj_weight.T + b.attn.in_proj_bias
        q, k, v = (_split_heads(t, heads) for t in qkv.chunk(3, dim=-1))
        if i >= gem_start:
            if x_gem is None:
                x_gem = x
            outs = []
            for t in (q, k, v):
                tn = F.normalize(t, dim=-1, eps=1e-6)
                attn = None
                for _ in range(max(iters, 1)):
                    attn = torch.softmax(temp * tn @ tn.transpose(-1, -2), dim=-1)
                    tn = F.normalize(attn @ tn, dim=-1, eps=1e-6)
                outs.append(attn @ v)
            ss = (outs[0] + outs[1] + outs[2]) / 3.0
            ss = ss.transpose(1, 2).reshape(N, -1, D)
            ss = ss @ b.attn.out_proj.weight.T + b.attn.out_proj.bias
            x_gem = x_gem + ss
        attn = torch.softmax(scale * q @ k.transpose(-1, -2), dim=-1)
        o = (attn @ v).transpose(1, 2).reshape(N, -1, D)
        o = o @ b.attn.out_proj.weight.T + b.attn.out_proj.bias
        x = x + o
        x = x + b.mlp(b.ln_2(x))

    feats = model.v_ln_post(x_gem) @ model.v_proj
    cls_f = model.v_ln_post(x[:, :1])[:, 0] @ model.v_proj
    return feats[:, 1:], cls_f
