"""Independent PyTorch oracle of the reference MatchaTTS forward pass.

Written from the behavioral spec in SURVEY.md (NOT copied from the
reference): channels-first torch modules whose attribute names match the
reference checkpoint naming, so `export_matcha_state_dict` output loads
directly via `load_state_dict`.  Used by tests/test_full_parity.py to pin
our JAX implementation + converter against an executable torch model —
the same role the released checkpoints would play if they were present in
this image.

Only inference paths (synthesise with injected noise) are implemented.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class ChannelLayerNorm(nn.Module):
    def __init__(self, channels, eps=1e-4):
        super().__init__()
        self.eps = eps
        self.gamma = nn.Parameter(torch.ones(channels))
        self.beta = nn.Parameter(torch.zeros(channels))

    def forward(self, x):  # (B, C, T), normalize over C
        mean = x.mean(1, keepdim=True)
        var = ((x - mean) ** 2).mean(1, keepdim=True)
        x = (x - mean) * torch.rsqrt(var + self.eps)
        return x * self.gamma[None, :, None] + self.beta[None, :, None]


class ConvReluNorm(nn.Module):
    def __init__(self, channels, kernel_size=5, n_layers=3):
        super().__init__()
        self.n_layers = n_layers
        self.conv_layers = nn.ModuleList(
            [nn.Conv1d(channels, channels, kernel_size, padding=kernel_size // 2) for _ in range(n_layers)]
        )
        self.norm_layers = nn.ModuleList([ChannelLayerNorm(channels) for _ in range(n_layers)])
        self.proj = nn.Conv1d(channels, channels, 1)

    def forward(self, x, x_mask):
        x0 = x
        for conv, norm in zip(self.conv_layers, self.norm_layers):
            x = torch.relu(norm(conv(x * x_mask)))
        return (x0 + self.proj(x)) * x_mask


class DurationPredictor(nn.Module):
    def __init__(self, in_ch, filt, kernel_size=3):
        super().__init__()
        self.conv_1 = nn.Conv1d(in_ch, filt, kernel_size, padding=kernel_size // 2)
        self.norm_1 = ChannelLayerNorm(filt)
        self.conv_2 = nn.Conv1d(filt, filt, kernel_size, padding=kernel_size // 2)
        self.norm_2 = ChannelLayerNorm(filt)
        self.proj = nn.Conv1d(filt, 1, 1)

    def forward(self, x, x_mask):
        x = self.norm_1(torch.relu(self.conv_1(x * x_mask)))
        x = self.norm_2(torch.relu(self.conv_2(x * x_mask)))
        return self.proj(x * x_mask) * x_mask


def rope_partial(x, rope_dim, base=10000.0):
    """x: (B, H, T, D); rotate first rope_dim dims, labml neg-half convention."""
    b, h, t, d_head = x.shape
    d = rope_dim
    theta = base ** (-torch.arange(0, d, 2, dtype=torch.float64) / d)
    ang = torch.arange(t, dtype=torch.float64)[:, None] * theta[None, :]
    ang2 = torch.cat([ang, ang], dim=1)  # (T, d)
    cos, sin = ang2.cos().float(), ang2.sin().float()
    xr, xp = x[..., :d], x[..., d:]
    neg = torch.cat([-xr[..., d // 2:], xr[..., : d // 2]], dim=-1)
    return torch.cat([xr * cos + neg * sin, xp], dim=-1)


class MultiHeadAttention(nn.Module):
    def __init__(self, channels, n_heads):
        super().__init__()
        self.n_heads = n_heads
        self.k_channels = channels // n_heads
        self.conv_q = nn.Conv1d(channels, channels, 1)
        self.conv_k = nn.Conv1d(channels, channels, 1)
        self.conv_v = nn.Conv1d(channels, channels, 1)
        self.conv_o = nn.Conv1d(channels, channels, 1)

    def forward(self, x, attn_mask):
        b, c, t = x.shape
        h, kc = self.n_heads, self.k_channels

        def split(z):  # (B, C, T) → (B, H, T, kc)
            return z.view(b, h, kc, t).permute(0, 1, 3, 2)

        q, k, v = split(self.conv_q(x)), split(self.conv_k(x)), split(self.conv_v(x))
        rd = int(kc * 0.5)
        q, k = rope_partial(q, rd), rope_partial(k, rd)
        scores = q @ k.transpose(-2, -1) / math.sqrt(kc)
        scores = scores.masked_fill(attn_mask == 0, -1e4)
        p = torch.softmax(scores, dim=-1)
        out = (p @ v).permute(0, 1, 3, 2).reshape(b, c, t)
        return self.conv_o(out)


class FFN(nn.Module):
    def __init__(self, channels, filt, kernel_size):
        super().__init__()
        self.conv_1 = nn.Conv1d(channels, filt, kernel_size, padding=kernel_size // 2)
        self.conv_2 = nn.Conv1d(filt, channels, kernel_size, padding=kernel_size // 2)

    def forward(self, x, x_mask):
        return self.conv_2(torch.relu(self.conv_1(x * x_mask)) * x_mask) * x_mask


class EncoderStack(nn.Module):
    def __init__(self, channels, filt, n_heads, n_layers, kernel_size):
        super().__init__()
        self.n_layers = n_layers
        self.attn_layers = nn.ModuleList([MultiHeadAttention(channels, n_heads) for _ in range(n_layers)])
        self.norm_layers_1 = nn.ModuleList([ChannelLayerNorm(channels) for _ in range(n_layers)])
        self.ffn_layers = nn.ModuleList([FFN(channels, filt, kernel_size) for _ in range(n_layers)])
        self.norm_layers_2 = nn.ModuleList([ChannelLayerNorm(channels) for _ in range(n_layers)])

    def forward(self, x, x_mask):
        attn_mask = x_mask.unsqueeze(2) * x_mask.unsqueeze(-1)  # (B,1,T,T)
        for i in range(self.n_layers):
            x = x * x_mask
            x = self.norm_layers_1[i](x + self.attn_layers[i](x, attn_mask))
            x = self.norm_layers_2[i](x + self.ffn_layers[i](x, x_mask))
        return x * x_mask


class TextEncoderOracle(nn.Module):
    def __init__(self, cfg, n_spks, spk_dim):
        super().__init__()
        ch = cfg.encoder.n_channels
        self.n_channels = ch
        self.emb = nn.Embedding(cfg.n_vocab, ch)
        self.prenet = ConvReluNorm(ch)
        hidden = ch + (spk_dim if n_spks > 1 else 0)
        self.encoder = EncoderStack(hidden, cfg.encoder.filter_channels, cfg.encoder.n_heads,
                                    cfg.encoder.n_layers, cfg.encoder.kernel_size)
        self.proj_m = nn.Conv1d(hidden, cfg.n_feats, 1)
        self.proj_w = DurationPredictor(hidden, cfg.duration_predictor.filter_channels_dp,
                                        cfg.duration_predictor.kernel_size)

    def forward(self, x, x_mask, spk_e):
        h = self.emb(x) * math.sqrt(self.n_channels)  # (B, T, C)
        h = h.transpose(1, 2)
        h = self.prenet(h, x_mask)
        if spk_e is not None:
            h = torch.cat([h, spk_e.unsqueeze(-1).expand(-1, -1, h.shape[-1])], dim=1)
        h = self.encoder(h, x_mask)
        mu = self.proj_m(h) * x_mask
        logw = self.proj_w(h.detach(), x_mask)
        return mu, logw


# --------------------------------------------------------------------------
# U-Net estimator
# --------------------------------------------------------------------------

class Mish(nn.Module):
    def forward(self, x):
        return x * torch.tanh(F.softplus(x))


class Block1D(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.block = nn.Sequential(nn.Conv1d(dim_in, dim_out, 3, padding=1),
                                   nn.GroupNorm(8, dim_out), Mish())

    def forward(self, x, mask):
        return self.block(x * mask) * mask


class ResnetBlock1D(nn.Module):
    def __init__(self, dim_in, dim_out, time_dim):
        super().__init__()
        self.mlp = nn.Sequential(Mish(), nn.Linear(time_dim, dim_out))
        self.block1 = Block1D(dim_in, dim_out)
        self.block2 = Block1D(dim_out, dim_out)
        self.res_conv = nn.Conv1d(dim_in, dim_out, 1)

    def forward(self, x, mask, t):
        h = self.block1(x, mask) + self.mlp(t).unsqueeze(-1)
        h = self.block2(h, mask)
        return h + self.res_conv(x * mask)


class SnakeBetaFF(nn.Module):
    """ff.net.0 = SnakeBeta proj, ff.net.2 = out Linear (reference naming)."""

    def __init__(self, dim, inner):
        super().__init__()
        proj = nn.Linear(dim, inner)
        snake = nn.Module()
        snake.proj = proj
        snake.alpha = nn.Parameter(torch.zeros(inner))
        snake.beta = nn.Parameter(torch.zeros(inner))
        self.net = nn.ModuleList([snake, nn.Identity(), nn.Linear(inner, dim)])

    def forward(self, x):
        s = self.net[0]
        h = s.proj(x)
        h = h + (1.0 / (torch.exp(s.beta) + 1e-9)) * torch.sin(h * torch.exp(s.alpha)) ** 2
        return self.net[2](h)


class AttentionOracle(nn.Module):
    """diffusers Attention numerics: no-bias qkv, bias out, additive float mask."""

    def __init__(self, dim, heads, head_dim):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(dim, inner, bias=False)
        self.to_v = nn.Linear(dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, dim), nn.Identity()])

    def forward(self, x, mask_bt):
        b, t, _ = x.shape

        def split(z):
            return z.view(b, t, self.heads, self.head_dim).permute(0, 2, 1, 3)

        q, k, v = split(self.to_q(x)), split(self.to_k(x)), split(self.to_v(x))
        scores = q @ k.transpose(-2, -1) / math.sqrt(self.head_dim)
        scores = scores + mask_bt[:, None, None, :]  # reference additive-0/1 quirk
        out = torch.softmax(scores, -1) @ v
        out = out.permute(0, 2, 1, 3).reshape(b, t, -1)
        return self.to_out[0](out)


class TBlockOracle(nn.Module):
    def __init__(self, dim, heads, head_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = AttentionOracle(dim, heads, head_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = SnakeBetaFF(dim, dim * 4)

    def forward(self, x, mask_bt):
        x = x + self.attn1(self.norm1(x), mask_bt)
        return x + self.ff(self.norm3(x))


class DecoderOracle(nn.Module):
    def __init__(self, cfg, in_channels, out_channels):
        super().__init__()
        chans = tuple(cfg.decoder.channels)
        tdim = chans[0] * 4
        self.in_channels = in_channels
        self.time_mlp = nn.Module()
        self.time_mlp.linear_1 = nn.Linear(in_channels, tdim)
        self.time_mlp.linear_2 = nn.Linear(tdim, tdim)

        def tblocks(ch):
            return nn.ModuleList([TBlockOracle(ch, cfg.decoder.num_heads, cfg.decoder.attention_head_dim)
                                  for _ in range(cfg.decoder.n_blocks)])

        self.down_blocks = nn.ModuleList()
        prev = in_channels
        for i, ch in enumerate(chans):
            is_last = i == len(chans) - 1
            down = nn.Conv1d(ch, ch, 3, padding=1) if is_last else None
            if not is_last:
                down_holder = nn.Module()
                down_holder.conv = nn.Conv1d(ch, ch, 3, 2, 1)
                down = down_holder
            self.down_blocks.append(nn.ModuleList([ResnetBlock1D(prev, ch, tdim), tblocks(ch), down]))
            prev = ch
        self.mid_blocks = nn.ModuleList(
            [nn.ModuleList([ResnetBlock1D(chans[-1], chans[-1], tdim), tblocks(chans[-1])])
             for _ in range(cfg.decoder.num_mid_blocks)]
        )
        up_chans = chans[::-1] + (chans[0],)
        self.up_blocks = nn.ModuleList()
        for i in range(len(up_chans) - 1):
            ch = up_chans[i + 1]
            is_last = i == len(up_chans) - 2
            if is_last:
                up = nn.Conv1d(ch, ch, 3, padding=1)
            else:
                up = nn.Module()
                up.conv = nn.ConvTranspose1d(ch, ch, 4, 2, 1)
            self.up_blocks.append(nn.ModuleList([ResnetBlock1D(2 * up_chans[i], ch, tdim), tblocks(ch), up]))
        self.final_block = Block1D(up_chans[-1], up_chans[-1])
        self.final_proj = nn.Conv1d(up_chans[-1], out_channels, 1)

    def sinusoidal(self, t):
        half = self.in_channels // 2
        freqs = torch.exp(torch.arange(half, dtype=torch.float32) * (-math.log(10000.0) / (half - 1)))
        ang = 1000.0 * t[:, None] * freqs[None]
        return torch.cat([ang.sin(), ang.cos()], dim=-1)

    def forward(self, x, mask, mu, t, spk_e):
        temb = self.time_mlp.linear_2(F.silu(self.time_mlp.linear_1(self.sinusoidal(t))))
        h = torch.cat([x, mu], dim=1)
        if spk_e is not None:
            h = torch.cat([h, spk_e.unsqueeze(-1).expand(-1, -1, h.shape[-1])], dim=1)

        def run_tb(h, blocks, m):
            hb = h.transpose(1, 2)
            for blk in blocks:
                hb = blk(hb, m[:, 0, :])
            return hb.transpose(1, 2)

        hiddens, masks = [], [mask]
        for resnet, blocks, down in self.down_blocks:
            m = masks[-1]
            h = resnet(h, m, temb)
            h = run_tb(h, blocks, m)
            hiddens.append(h)
            h = (down.conv if hasattr(down, "conv") else down)(h * m)
            masks.append(m[:, :, ::2])
        masks = masks[:-1]
        m_mid = masks[-1]
        for resnet, blocks in self.mid_blocks:
            h = resnet(h, m_mid, temb)
            h = run_tb(h, blocks, m_mid)
        for resnet, blocks, up in self.up_blocks:
            m = masks.pop()
            h = resnet(torch.cat([h, hiddens.pop()], dim=1), m, temb)
            h = run_tb(h, blocks, m)
            h = (up.conv if hasattr(up, "conv") else up)(h * m)
        h = self.final_block(h, m)
        return self.final_proj(h * m) * mask


class MatchaOracle(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        if cfg.n_spks > 1:
            self.spk_emb = nn.Embedding(cfg.n_spks, cfg.spk_emb_dim)
        self.encoder = TextEncoderOracle(cfg, cfg.n_spks, cfg.spk_emb_dim)
        est = DecoderOracle(cfg, 2 * cfg.n_feats + (cfg.spk_emb_dim if cfg.n_spks > 1 else 0),
                            cfg.n_feats)
        dec = nn.Module()
        dec.estimator = est
        self.decoder = dec

    @torch.no_grad()
    def synthesise(self, x, x_lengths, y_max_length, n_timesteps, temperature, spks, length_scale, z):
        cfg = self.cfg
        spk_e = self.spk_emb(spks) if cfg.n_spks > 1 else None
        t_max = x.shape[1]
        x_mask = (torch.arange(t_max)[None, :] < x_lengths[:, None]).float().unsqueeze(1)
        mu_x, logw = self.encoder(x, x_mask, spk_e)
        w = torch.exp(logw) * x_mask
        w_ceil = torch.ceil(w) * length_scale  # fork quirk: scale after ceil
        y_lengths = torch.clamp_min(torch.sum(w_ceil, (1, 2)), 1).long()
        y_lengths = torch.minimum(y_lengths, torch.tensor(y_max_length))
        y_mask = (torch.arange(y_max_length)[None, :] < y_lengths[:, None]).float().unsqueeze(1)
        attn_mask = x_mask.unsqueeze(-1) * y_mask.unsqueeze(2)  # (B,1,Tx,Ty)

        # generate_path: cumsum → per-row mask → first difference
        cum = torch.cumsum(w_ceil.squeeze(1), dim=1)  # (B, Tx)
        pos = torch.arange(y_max_length)[None, None, :]
        path_cum = (pos < cum[:, :, None]).float()
        path = path_cum - F.pad(path_cum, (0, 0, 1, 0))[:, :-1]
        attn = path * attn_mask.squeeze(1)

        mu_y = torch.matmul(attn.transpose(1, 2), mu_x.transpose(1, 2)).transpose(1, 2)

        # Euler CFM with injected noise z (B, n_feats, Ty)
        xs = z * y_mask
        dt = 1.0 / n_timesteps
        for step in range(n_timesteps):
            t = torch.full((xs.shape[0],), step * dt)
            xs = xs + dt * self.decoder.estimator(xs, y_mask, mu_y, t, spk_e)
        dec_out = xs * y_mask
        mel = dec_out * cfg.data_statistics.mel_std + cfg.data_statistics.mel_mean
        return {"decoder_outputs": dec_out, "mel": mel, "mel_lengths": y_lengths, "attn": attn}
