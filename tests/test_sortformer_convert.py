"""Sortformer (and shared FastConformer) checkpoint-conversion golden parity.

A torch replica of the NeMo module graph in the upstream state-dict naming
(encoder.pre_encode.conv.{0,2,3,5,6} / encoder.layers.{i}.* conformer
blocks / transformer_encoder.layers.{i}.first+second_sub_layer /
sortformer_modules.*) is converted through ``map_sortformer_state_dict``
and must match our jitted chunk program.  This also exercises the Parakeet
``convert_encoder`` numerically (the two models share the FastConformer).

The relative-position bd term in the torch replica is computed by naive
gather over offsets (unambiguous definition); the JAX ``_rel_shift`` is
separately tested against the same gather in test_parakeet.py.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn

from qwen3_asr_swift_tpu.models.diarization.sortformer import (
    SortformerConfig,
    sortformer_chunk,
)
from qwen3_asr_swift_tpu.models.diarization.sortformer_convert import (
    map_sortformer_state_dict,
)
from qwen3_asr_swift_tpu.models.parakeet.encoder import rel_pos_encoding

# tiny geometry
MELS, C_SUB, D_ENC, HEADS, FF_X, KERNEL, ENC_L = 32, 8, 16, 2, 4, 5, 2
D_TF, TF_FF, TF_L, SPKS = 8, 16, 2, 3
T_MEL = 24


class PreEncode(nn.Module):
    """NeMo ConvSubsampling (dw_striding, factor 8)."""

    def __init__(self):
        super().__init__()
        f_sub = MELS
        for _ in range(3):
            f_sub = (f_sub - 1) // 2 + 1
        self.conv = nn.Sequential(
            nn.Conv2d(1, C_SUB, 3, stride=2, padding=1), nn.ReLU(),
            nn.Conv2d(C_SUB, C_SUB, 3, stride=2, padding=1, groups=C_SUB),
            nn.Conv2d(C_SUB, C_SUB, 1), nn.ReLU(),
            nn.Conv2d(C_SUB, C_SUB, 3, stride=2, padding=1, groups=C_SUB),
            nn.Conv2d(C_SUB, C_SUB, 1), nn.ReLU(),
        )
        self.out = nn.Linear(C_SUB * f_sub, D_ENC)

    def forward(self, x):  # [B, T, F]
        x = self.conv(x.unsqueeze(1))           # [B, C, T', F']
        b, c, t, f = x.size()
        return self.out(x.transpose(1, 2).reshape(b, t, -1))


class RelPosAttention(nn.Module):
    def __init__(self):
        super().__init__()
        d, h = D_ENC, HEADS
        self.linear_q = nn.Linear(d, d)
        self.linear_k = nn.Linear(d, d)
        self.linear_v = nn.Linear(d, d)
        self.linear_out = nn.Linear(d, d)
        self.linear_pos = nn.Linear(d, d, bias=False)
        self.pos_bias_u = nn.Parameter(torch.randn(h, d // h) * 0.1)
        self.pos_bias_v = nn.Parameter(torch.randn(h, d // h) * 0.1)

    def forward(self, x):  # [B, T, d]
        b, t, d = x.shape
        h, hd = HEADS, d // HEADS
        q = self.linear_q(x).view(b, t, h, hd)
        k = self.linear_k(x).view(b, t, h, hd).transpose(1, 2)
        v = self.linear_v(x).view(b, t, h, hd).transpose(1, 2)
        pe = torch.from_numpy(rel_pos_encoding(t, d))           # [2T-1, d]
        pos = self.linear_pos(pe).view(2 * t - 1, h, hd)
        ac = torch.einsum("bqhd,bhkd->bhqk", q + self.pos_bias_u, k)
        # naive gather per Transformer-XL: bd[b,h,i,j] uses pos column
        # (T-1)+(j-i) — i.e. the sinusoid for relative position i-j, since
        # rel_pos_encoding rows run T-1 … -(T-1)
        qv = q + self.pos_bias_v                                # [B,T,H,hd]
        bd_full = torch.einsum("bqhd,lhd->bhql", qv, pos)       # [B,H,T,2T-1]
        idx = (t - 1) + (torch.arange(t)[None, :] - torch.arange(t)[:, None])
        bd = bd_full.gather(3, idx[None, None].expand(b, h, t, t))
        scores = (ac + bd) / math.sqrt(hd)
        out = torch.softmax(scores, -1) @ v                     # [B,H,T,hd]
        return self.linear_out(out.transpose(1, 2).reshape(b, t, d))


class ConvModule(nn.Module):
    def __init__(self):
        super().__init__()
        d = D_ENC
        self.pointwise_conv1 = nn.Conv1d(d, 2 * d, 1, bias=False)
        self.depthwise_conv = nn.Conv1d(d, d, KERNEL, padding=(KERNEL - 1) // 2,
                                        groups=d, bias=False)
        self.batch_norm = nn.BatchNorm1d(d)
        self.pointwise_conv2 = nn.Conv1d(d, d, 1, bias=False)

    def forward(self, x):  # [B, T, d]
        y = x.transpose(1, 2)
        y = self.pointwise_conv1(y)
        y = nn.functional.glu(y, dim=1)
        y = self.depthwise_conv(y)
        y = self.batch_norm(y)
        y = y * torch.sigmoid(y)  # swish
        return self.pointwise_conv2(y).transpose(1, 2)


class FeedForward(nn.Module):
    def __init__(self):
        super().__init__()
        self.linear1 = nn.Linear(D_ENC, D_ENC * FF_X)
        self.linear2 = nn.Linear(D_ENC * FF_X, D_ENC)

    def forward(self, x):
        h = self.linear1(x)
        return self.linear2(h * torch.sigmoid(h))


class ConformerLayer(nn.Module):
    def __init__(self):
        super().__init__()
        d = D_ENC
        self.norm_feed_forward1 = nn.LayerNorm(d)
        self.feed_forward1 = FeedForward()
        self.norm_self_att = nn.LayerNorm(d)
        self.self_attn = RelPosAttention()
        self.norm_conv = nn.LayerNorm(d)
        self.conv = ConvModule()
        self.norm_feed_forward2 = nn.LayerNorm(d)
        self.feed_forward2 = FeedForward()
        self.norm_out = nn.LayerNorm(d)

    def forward(self, x):
        x = x + 0.5 * self.feed_forward1(self.norm_feed_forward1(x))
        x = x + self.self_attn(self.norm_self_att(x))
        x = x + self.conv(self.norm_conv(x))
        x = x + 0.5 * self.feed_forward2(self.norm_feed_forward2(x))
        return self.norm_out(x)


class Encoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.pre_encode = PreEncode()
        self.layers = nn.ModuleList([ConformerLayer() for _ in range(ENC_L)])

    def forward(self, mel):
        x = self.pre_encode(mel)
        for l in self.layers:
            x = l(x)
        return x


class TfLayer(nn.Module):
    """NeMo post-LN TransformerEncoderBlock naming."""

    class Attn(nn.Module):
        def __init__(self):
            super().__init__()
            self.query_net = nn.Linear(D_TF, D_TF)
            self.key_net = nn.Linear(D_TF, D_TF)
            self.value_net = nn.Linear(D_TF, D_TF)
            self.out_projection = nn.Linear(D_TF, D_TF)

        def forward(self, x):
            b, t, d = x.shape
            h, hd = 2, d // 2
            q = self.query_net(x).view(b, t, h, hd).transpose(1, 2)
            k = self.key_net(x).view(b, t, h, hd).transpose(1, 2)
            v = self.value_net(x).view(b, t, h, hd).transpose(1, 2)
            a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hd), -1) @ v
            return self.out_projection(a.transpose(1, 2).reshape(b, t, d))

    class Ffn(nn.Module):
        def __init__(self):
            super().__init__()
            self.dense_in = nn.Linear(D_TF, TF_FF)
            self.dense_out = nn.Linear(TF_FF, D_TF)

        def forward(self, x):
            return self.dense_out(torch.relu(self.dense_in(x)))

    def __init__(self):
        super().__init__()
        self.first_sub_layer = self.Attn()
        self.layer_norm_1 = nn.LayerNorm(D_TF)
        self.second_sub_layer = self.Ffn()
        self.layer_norm_2 = nn.LayerNorm(D_TF)

    def forward(self, x):
        x = self.layer_norm_1(x + self.first_sub_layer(x))
        return self.layer_norm_2(x + self.second_sub_layer(x))


class SortformerModules(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder_proj = nn.Linear(D_ENC, D_TF)
        self.first_hidden_to_hidden = nn.Linear(D_TF, D_TF)
        self.single_hidden_to_spks = nn.Linear(D_TF, SPKS)


class NemoSortformer(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = Encoder()

        class TE(nn.Module):
            def __init__(self):
                super().__init__()
                self.layers = nn.ModuleList([TfLayer() for _ in range(TF_L)])

            def forward(self, x):
                for l in self.layers:
                    x = l(x)
                return x

        self.transformer_encoder = TE()
        self.sortformer_modules = SortformerModules()

    def forward(self, mel):
        emb = self.encoder(mel)
        x = self.sortformer_modules.encoder_proj(emb)
        x = self.transformer_encoder(x)
        h = torch.relu(x)
        h = self.sortformer_modules.first_hidden_to_hidden(h)
        h = torch.relu(h)
        return torch.sigmoid(self.sortformer_modules.single_hidden_to_spks(h)), emb


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    net = NemoSortformer().eval()
    for mod in net.modules():
        if isinstance(mod, nn.BatchNorm1d):
            mod.running_mean.uniform_(-0.2, 0.2)
            mod.running_var.uniform_(0.5, 2.0)
            mod.weight.data.uniform_(0.5, 1.5)
            mod.bias.data.uniform_(-0.2, 0.2)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()
          if "num_batches" not in k}
    cfg, params = map_sortformer_state_dict(sd)
    # streaming geometry for the chunk test (state caps don't affect parity
    # of a zero-state chunk)
    import dataclasses

    cfg = dataclasses.replace(cfg, chunk_len_s=T_MEL * 160 / 16000,
                              left_context_s=0.0, right_context_s=0.0,
                              spkcache_len=6, fifo_len=4)
    return net, cfg, params


class TestConvertedConfig:
    def test_dims_inferred(self, pair):
        _, cfg, params = pair
        assert cfg.encoder_layers == ENC_L and cfg.encoder_hidden == D_ENC
        assert cfg.tf_layers == TF_L and cfg.tf_hidden == D_TF and cfg.tf_ff == TF_FF
        assert cfg.max_speakers == SPKS
        assert cfg.n_mels == MELS
        assert cfg.num_heads == HEADS
        assert cfg.conv_kernel == KERNEL
        assert len(params["transformer"]) == TF_L


class TestGoldenParity:
    def test_chunk_matches_torch(self, pair):
        net, cfg, params = pair
        rng = np.random.default_rng(1)
        mel = rng.standard_normal((T_MEL, MELS)).astype(np.float32) * 0.5

        with torch.no_grad():
            t_preds, t_embs = net(torch.from_numpy(mel)[None])

        preds, embs, n_emb = sortformer_chunk(
            params, cfg,
            chunk_mel=jnp.asarray(mel),
            chunk_len=jnp.asarray(T_MEL, jnp.int32),
            spkcache=jnp.zeros((cfg.spkcache_len, cfg.d_model)),
            spk_len=jnp.asarray(0, jnp.int32),
            fifo=jnp.zeros((cfg.fifo_len, cfg.d_model)),
            fifo_len=jnp.asarray(0, jnp.int32))

        n = int(n_emb)
        assert n == t_embs.shape[1]
        np.testing.assert_allclose(np.asarray(embs)[:n], t_embs[0].numpy(),
                                   rtol=3e-4, atol=3e-5)
        core = np.asarray(preds)[cfg.spkcache_len + cfg.fifo_len:][:n]
        np.testing.assert_allclose(core, t_preds[0].numpy(), rtol=3e-4, atol=3e-5)


class TestStreamingStateAtPretrainedSizes:
    def test_update_state_handles_chunks_larger_than_fifo(self):
        """The pretrained config feeds 75-frame chunks into a 40-slot FIFO;
        the old in-place shuffle read stale zero rows into the speaker
        cache and then crashed on a broadcast mismatch."""
        import numpy as np

        from qwen3_asr_swift_tpu.models.diarization.sortformer import (
            CONFIG_SORTFORMER, SortformerDiarizer)

        d = SortformerDiarizer.__new__(SortformerDiarizer)
        d.cfg = CONFIG_SORTFORMER
        d.reset_state()
        for chunk in range(5):
            embs = np.full((75, d.cfg.d_model), chunk + 1, np.float32)
            d._update_state(embs)
            assert d._fifo_len <= d.cfg.fifo_len
            assert d._spk_len <= d.cfg.spkcache_len
        # FIFO ends with the newest chunk's rows; cache rows are real (no
        # stale zeros marked valid)
        assert (d._fifo[d._fifo_len - 1] == 5).all()
        assert (d._spkcache[: d._spk_len] != 0).any(axis=1).all()
