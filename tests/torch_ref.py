"""Minimal torch implementations of the public CLIP/SAM architectures.

Used only by the test-suite as a numeric oracle: we build a tiny randomly
initialised torch model, export its state dict in the upstream checkpoint
naming convention, convert it with hybridgl_tpu.core.convert, and assert
our JAX forward matches the torch forward. This validates both the
converter's layout mapping and the model math.
"""

from collections import OrderedDict

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class ResBlock(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.attn = nn.MultiheadAttention(d, h)
        self.ln_1 = nn.LayerNorm(d)
        self.mlp = nn.Sequential(
            OrderedDict(
                [
                    ("c_fc", nn.Linear(d, d * 4)),
                    ("gelu", QuickGELU()),
                    ("c_proj", nn.Linear(d * 4, d)),
                ]
            )
        )
        self.ln_2 = nn.LayerNorm(d)

    def forward(self, x, attn_mask=None):  # x: [L, N, D]
        y = self.ln_1(x)
        y = self.attn(y, y, y, need_weights=False, attn_mask=attn_mask)[0]
        x = x + y
        return x + self.mlp(self.ln_2(x))


class TinyTransformer(nn.Module):
    def __init__(self, width, layers, heads):
        super().__init__()
        self.resblocks = nn.ModuleList([ResBlock(width, heads) for _ in range(layers)])

    def forward(self, x, attn_mask=None):
        for b in self.resblocks:
            x = b(x, attn_mask)
        return x


class TinyCLIP(nn.Module):
    """OpenAI-CLIP-compatible tiny model (ViT visual + text transformer)."""

    def __init__(self, cfg):
        super().__init__()
        vw, tw = cfg.vision_width, cfg.text_width
        self.cfg = cfg
        # visual
        self.v_conv1 = nn.Conv2d(3, vw, cfg.patch_size, cfg.patch_size, bias=False)
        self.v_class = nn.Parameter(torch.randn(vw) * vw**-0.5)
        self.v_pos = nn.Parameter(torch.randn(cfg.seq_len, vw) * vw**-0.5)
        self.v_ln_pre = nn.LayerNorm(vw)
        self.v_tr = TinyTransformer(vw, cfg.vision_layers, cfg.vision_heads)
        self.v_ln_post = nn.LayerNorm(vw)
        self.v_proj = nn.Parameter(torch.randn(vw, cfg.embed_dim) * vw**-0.5)
        # text
        self.token_embedding = nn.Embedding(cfg.vocab_size, tw)
        self.t_pos = nn.Parameter(torch.randn(cfg.context_length, tw) * 0.01)
        self.t_tr = TinyTransformer(tw, cfg.text_layers, cfg.text_heads)
        self.ln_final = nn.LayerNorm(tw)
        self.text_projection = nn.Parameter(torch.randn(tw, cfg.embed_dim) * tw**-0.5)
        self.logit_scale = nn.Parameter(torch.tensor(np.log(1 / 0.07), dtype=torch.float32))

    # --- forwards ---------------------------------------------------------
    def visual_stem(self, images):  # [N,3,H,W] -> [L,N,D]
        x = self.v_conv1(images)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.v_class + torch.zeros(x.shape[0], 1, x.shape[-1])
        x = torch.cat([cls, x], dim=1) + self.v_pos
        x = self.v_ln_pre(x)
        return x.permute(1, 0, 2)

    def encode_image(self, images, cls_only=True):
        x = self.v_tr(self.visual_stem(images)).permute(1, 0, 2)
        x = self.v_ln_post(x)  # all tokens, like the modified CLIP
        x = x @ self.v_proj
        return x[:, 0, :] if cls_only else x

    def causal_mask(self):
        L = self.cfg.context_length
        m = torch.full((L, L), float("-inf"))
        return m.triu_(1)

    def encode_text(self, tokens):
        x = self.token_embedding(tokens) + self.t_pos
        x = self.t_tr(x.permute(1, 0, 2), self.causal_mask()).permute(1, 0, 2)
        x = self.ln_final(x)
        x = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
        return x @ self.text_projection

    # --- checkpoint-format export -----------------------------------------
    def openai_state_dict(self):
        sd = {}
        sd["visual.conv1.weight"] = self.v_conv1.weight
        sd["visual.class_embedding"] = self.v_class
        sd["visual.positional_embedding"] = self.v_pos
        sd["visual.ln_pre.weight"] = self.v_ln_pre.weight
        sd["visual.ln_pre.bias"] = self.v_ln_pre.bias
        for scope, tr in (("visual.transformer", self.v_tr), ("transformer", self.t_tr)):
            for i, b in enumerate(tr.resblocks):
                p = f"{scope}.resblocks.{i}"
                sd[f"{p}.attn.in_proj_weight"] = b.attn.in_proj_weight
                sd[f"{p}.attn.in_proj_bias"] = b.attn.in_proj_bias
                sd[f"{p}.attn.out_proj.weight"] = b.attn.out_proj.weight
                sd[f"{p}.attn.out_proj.bias"] = b.attn.out_proj.bias
                for ln in ("ln_1", "ln_2"):
                    mod = getattr(b, ln)
                    sd[f"{p}.{ln}.weight"] = mod.weight
                    sd[f"{p}.{ln}.bias"] = mod.bias
                sd[f"{p}.mlp.c_fc.weight"] = b.mlp.c_fc.weight
                sd[f"{p}.mlp.c_fc.bias"] = b.mlp.c_fc.bias
                sd[f"{p}.mlp.c_proj.weight"] = b.mlp.c_proj.weight
                sd[f"{p}.mlp.c_proj.bias"] = b.mlp.c_proj.bias
        sd["visual.ln_post.weight"] = self.v_ln_post.weight
        sd["visual.ln_post.bias"] = self.v_ln_post.bias
        sd["visual.proj"] = self.v_proj
        sd["token_embedding.weight"] = self.token_embedding.weight
        sd["positional_embedding"] = self.t_pos
        sd["ln_final.weight"] = self.ln_final.weight
        sd["ln_final.bias"] = self.ln_final.bias
        sd["text_projection"] = self.text_projection
        sd["logit_scale"] = self.logit_scale
        return {k: v.detach() for k, v in sd.items()}


# ---------------------------------------------------------------------------
# fusion-mode oracle (torch re-statement of the HybridGL fusion semantics)
# ---------------------------------------------------------------------------


def _torch_make_attn_mask(masks_grid, num_heads):
    # CLS row allowed only at nonzero mask patches; invert for torch (True=drop)
    P, g, _ = masks_grid.shape
    L = g * g + 1
    allowed = torch.ones(P * num_heads, L, L, dtype=torch.bool)
    patch_ok = (masks_grid.reshape(P, 1, -1) != 0).expand(P, num_heads, g * g)
    allowed[:, 0, 1:] = patch_ok.reshape(P * num_heads, g * g)
    return ~allowed


def _torch_token_mask(x, masks_grid):
    # x: [L, P, D] (torch LND); multiply patch rows by fractional mask
    L, P, D = x.shape
    cls, patches = x[:1], x[1:]
    m = masks_grid.reshape(P, -1).T.unsqueeze(-1)  # [L-1, P, 1]
    return torch.cat([cls, patches * m], dim=0)


@torch.no_grad()
def torch_hybrid_forward(model, local, glob, masks, mode, masking_block=None, last_layer=None):
    """Oracle for the five fusion modes on TinyCLIP ([P,3,S,S] inputs)."""
    cfg = model.cfg
    n_blocks = cfg.vision_layers
    last = n_blocks - 2 if last_layer is None else last_layer
    mb = last if masking_block is None else masking_block
    heads = cfg.vision_heads

    def head(x):  # [L, P, D] -> [P, embed]
        x = x.permute(1, 0, 2)
        return model.v_ln_post(x[:, 0, :]) @ model.v_proj

    blocks = model.v_tr.resblocks
    x = model.visual_stem(local)
    if mode == "crop":
        for b in blocks:
            x = b(x)
        return head(x)

    g = cfg.image_size // cfg.patch_size
    masks_grid = F.interpolate(
        masks.float().unsqueeze(1), (g, g), mode="bilinear", align_corners=False
    )[:, 0]

    if mode == "token_masking":
        for i, b in enumerate(blocks):
            if i >= mb:
                x = _torch_token_mask(x, masks_grid)
                x = b(x)
                if i == last + 1:
                    return head(x)
            else:
                x = b(x)

    attn_mask = _torch_make_attn_mask(masks_grid, heads)
    if mode == "attn_masking":
        for i, b in enumerate(blocks):
            if i >= mb:
                x = b(x, attn_mask=attn_mask)
                if i == last:  # reference early exit quirk
                    return head(x)
            else:
                x = b(x)

    x2 = model.visual_stem(glob)
    P = local.shape[0]
    x1_x2 = torch.cat([x, x2], dim=1)
    if mode == "L2G":
        for i, b in enumerate(blocks):
            if i >= mb:
                if i == mb:
                    x, x2 = x1_x2[:, :P], x1_x2[:, P:]
                x_ori_local = x.clone()
                x = b(x)
                x2 = b(x_ori_local + x2 * 2, attn_mask=attn_mask)
            else:
                x1_x2 = b(x1_x2)
            if i == last + 1:
                return head(x2)
    if mode == "G2L":
        for i, b in enumerate(blocks):
            if i >= mb:
                if i == mb:
                    x, x2 = x1_x2[:, :P], x1_x2[:, P:]
                x_ori_global = _torch_token_mask(x2.clone(), masks_grid)
                x = b(x_ori_global * 2 + x)
                x2 = b(x2, attn_mask=attn_mask)
            else:
                x1_x2 = b(x1_x2)
            if i == last + 1:
                return head(x)
    if mode == "G2L&L2G":
        for i, b in enumerate(blocks):
            if i >= mb:
                if i == mb:
                    x, x2 = x1_x2[:, :P], x1_x2[:, P:]
                    xh_l, xh_g = x.clone(), x2.clone()
                x_ori_local = x.clone()
                x_ori_global = _torch_token_mask(x2.clone(), masks_grid)
                x = b(x)
                x2 = b(x2, attn_mask=attn_mask)
                xh_l = b(xh_l + 2 * x_ori_global)
                xh_g = b(x_ori_local + 2 * xh_g, attn_mask=attn_mask)
            else:
                x1_x2 = b(x1_x2)
            if i == last + 1:
                return head(xh_l) + head(xh_g)
    raise ValueError(mode)


def tiny_clip_config():
    from hybridgl_tpu.core.config import clip_preset

    return clip_preset("test-tiny")


def make_tiny_clip(seed=0):
    torch.manual_seed(seed)
    cfg = tiny_clip_config()
    model = TinyCLIP(cfg).eval()
    return model, cfg
