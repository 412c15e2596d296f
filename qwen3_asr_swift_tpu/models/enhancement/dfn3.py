"""DeepFilterNet3 network — the published topology, TPU-native.

The reference ships the net as an opaque CoreML bundle
(reference: Sources/SpeechEnhancement/DeepFilterNet3Model.swift:9-51) but
pins every hyperparameter in Sources/SpeechEnhancement/Configuration.swift:53-73:
conv_ch=64, emb_hidden=256, encoder GRU 1 layer, ERB-decoder GRU 2 layers,
DF-decoder GRU 2 layers, enc_lin_groups=32, lin_groups=16, conv/df lookahead 2.
The module graph below is the published DeepFilterNet3 architecture
(encoder with separable-conv ERB + complex-spec pathways, SqueezedGRU_S
embedding, U-Net-style ERB mask decoder, grouped-linear deep-filter decoder)
expressed as pure JAX functions:

  * convolutions are NCHW ``lax.conv_general_dilated`` calls with torch OIHW
    weights (convert.py copies upstream tensors verbatim),
  * the three GRU stacks are ``lax.scan`` recurrences with torch gate order
    (reset, update, new — candidate uses the reset-gated recurrent term),
  * the 2-frame conv lookahead is applied as a global feature shift at net
    entry (equivalent to the upstream asymmetric time pads: a causal
    kernel-3 conv over features shifted forward by 2 sees frames t..t+2),
    matching the reference note that the CoreML model applies lookahead
    internally (SpeechEnhancement.swift:127).

Streaming: every time-dependent piece of the net (conv input histories and
GRU hidden states) is carried in an explicit ``DfnState`` pytree so chunked
inference is exact w.r.t. the batch pass.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Hyperparameters — reference Configuration.swift:53-73.
NB_ERB = 32
NB_DF = 96
DF_ORDER = 5
CONV_CH = 64
EMB_HIDDEN = 256
EMB_DIM = CONV_CH * NB_ERB // 4  # 512 (encoder embedding / GRU in-out width)
DF_HIDDEN = 256
ENC_LIN_GROUPS = 32
LIN_GROUPS = 16
LOOKAHEAD = 2
DF_PATHWAY_KT = 5
LSNR_MIN = -15.0
LSNR_MAX = 35.0


# ---------------------------------------------------------------------------
# primitive layers
# ---------------------------------------------------------------------------

def _conv_nchw(x, w, *, stride=(1, 1), padding=((0, 0), (0, 0)), groups=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups)


def _bn(x, p):
    """Inference-mode BatchNorm2d over the channel axis of NCHW."""
    inv = jax.lax.rsqrt(p["var"] + 1e-5)
    return (x - p["mean"][None, :, None, None]) * (inv * p["scale"])[None, :, None, None] \
        + p["bias"][None, :, None, None]


def conv_norm_act(x, p, *, kernel_t: int, fstride: int = 1,
                  act: str = "relu", hist=None):
    """Conv2dNormAct: causal time pad → conv (+ optional 1x1 pointwise when
    separable) → BatchNorm → activation.  ``hist`` [1,C,kernel_t-1,F] replaces
    the leading zero pad for streaming; returns (y, new_hist).  The group
    count is inferred from the weight shape (upstream picks
    ``gcd(in,out)`` for separable convs), so converted checkpoints drive
    the exact layout."""
    kt = kernel_t
    new_hist = None
    if kt > 1:
        if hist is None:
            hist = jnp.zeros(x.shape[:2] + (kt - 1, x.shape[3]), x.dtype)
        x = jnp.concatenate([hist, x], axis=2)
        new_hist = x[:, :, -(kt - 1):, :]
    kf = p["w"].shape[-1]
    groups = x.shape[1] // p["w"].shape[1]
    y = _conv_nchw(x, p["w"], stride=(1, fstride),
                   padding=((0, 0), (kf // 2, kf // 2)), groups=groups)
    if "b" in p:
        y = y + p["b"][None, :, None, None]
    if "pw" in p:
        y = _conv_nchw(y, p["pw"])
    if "bn" in p:
        y = _bn(y, p["bn"])
    if act == "relu":
        y = jax.nn.relu(y)
    elif act == "sigmoid":
        y = jax.nn.sigmoid(y)
    return y, new_hist


def conv_transpose_norm_act(x, p, *, fstride: int = 2):
    """ConvTranspose2dNormAct over the frequency axis: torch
    ConvTranspose2d(kernel (1,3), stride (1,fstride), padding (0,1),
    output_padding (0,fstride-1)) → out_freq = in_freq * fstride.

    Expressed as an lhs-dilated grouped conv; ``p["w"]`` is stored in OIHW
    with frequency taps already flipped (convert.py does the torch
    (I,O/g,kh,kw) → flipped (O,I/g,kh,kw) rewrite at conversion time, the
    same convention as the Kokoro decoder pool — models/kokoro/model.py:306)."""
    kf = p["w"].shape[-1]
    groups = x.shape[1] // p["w"].shape[1]
    # pad = (kf-1-torch_pad, kf-1-torch_pad+output_padding) with torch_pad=1.
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1),
        padding=((0, 0), (kf - 2, kf - 2 + fstride - 1)),
        lhs_dilation=(1, fstride),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups)
    if "b" in p:
        y = y + p["b"][None, :, None, None]
    if "pw" in p:
        y = _conv_nchw(y, p["pw"])
    if "bn" in p:
        y = _bn(y, p["bn"])
    return jax.nn.relu(y)


def grouped_linear(x, w):
    """GroupedLinearEinsum: x [T, in], w [groups, in/groups, out/groups]."""
    t = x.shape[0]
    g = w.shape[0]
    xg = x.reshape(t, g, -1)
    return jnp.einsum("tgi,gih->tgh", xg, w).reshape(t, -1)


def _gru_layer(x, p, h0):
    """Torch nn.GRU single layer over [T, D].  Gate order (r, z, n)."""
    hid = p["wh"].shape[1]

    def step(h, xt):
        gi = xt @ p["wi"].T + p["bi"]
        gh = h @ p["wh"].T + p["bh"]
        ir, iz, in_ = jnp.split(gi, 3)
        hr, hz, hn = jnp.split(gh, 3)
        r = jax.nn.sigmoid(ir + hr)
        z = jax.nn.sigmoid(iz + hz)
        n = jnp.tanh(in_ + r * hn)
        h = (1.0 - z) * n + z * h
        return h, h

    if h0 is None:
        h0 = jnp.zeros((hid,), x.dtype)
    hT, ys = jax.lax.scan(step, h0, x)
    return ys, hT


def squeezed_gru(x, p, hs=None):
    """SqueezedGRU_S: grouped linear-in (+ReLU) → n-layer GRU → optional
    grouped linear-out (+ReLU).  ``hs`` is a tuple of per-layer hidden states."""
    y = jax.nn.relu(grouped_linear(x, p["lin_in"]))
    n_layers = len(p["gru"])
    if hs is None:
        hs = (None,) * n_layers
    new_hs = []
    for i, layer in enumerate(p["gru"]):
        y, hT = _gru_layer(y, layer, hs[i])
        new_hs.append(hT)
    if "lin_out" in p:
        y = jax.nn.relu(grouped_linear(y, p["lin_out"]))
    return y, tuple(new_hs)


# ---------------------------------------------------------------------------
# state
# ---------------------------------------------------------------------------

class DfnState(NamedTuple):
    """Carried network state for streaming (conv histories + GRU hiddens)."""
    erb_conv0_hist: jnp.ndarray   # [1,1,2,32] past net-input ERB frames
    df_conv0_hist: jnp.ndarray    # [1,2,2,96] past net-input spec frames
    df_convp_hist: jnp.ndarray    # [1,64,4,96] past c0 frames
    enc_gru: tuple                # 1 × [256]
    erb_gru: tuple                # 2 × [256]
    df_gru: tuple                 # 2 × [256]


def init_state(dtype=jnp.float32) -> DfnState:
    z = lambda *s: jnp.zeros(s, dtype)
    return DfnState(
        erb_conv0_hist=z(1, 1, 2, NB_ERB),
        df_conv0_hist=z(1, 2, 2, NB_DF),
        df_convp_hist=z(1, CONV_CH, DF_PATHWAY_KT - 1, NB_DF),
        enc_gru=(z(EMB_HIDDEN),),
        erb_gru=(z(EMB_HIDDEN), z(EMB_HIDDEN)),
        df_gru=(z(DF_HIDDEN), z(DF_HIDDEN)),
    )


# ---------------------------------------------------------------------------
# the network
# ---------------------------------------------------------------------------

def dfn3_step(params, feat_erb, feat_spec, state: DfnState):
    """One streaming step over already-lookahead-shifted net inputs.

    feat_erb: [F, 32] normalized dB ERB features (net-input timeline)
    feat_spec: [F, 96, 2] unit-normalized complex low-band spectrum
    Returns (erb_mask [F,32], df_coefs [F,96,5,2], lsnr [F], new_state).
    """
    enc, erb_dec, df_dec = params["enc"], params["erb_dec"], params["df_dec"]
    T = feat_erb.shape[0]

    xe = feat_erb[None, None]                       # [1,1,T,32]
    xs = jnp.moveaxis(feat_spec, -1, 0)[None]       # [1,2,T,96]

    e0, h_e = conv_norm_act(xe, enc["erb_conv0"], kernel_t=3,
                            hist=state.erb_conv0_hist)
    e1, _ = conv_norm_act(e0, enc["erb_conv1"], kernel_t=1, fstride=2)
    e2, _ = conv_norm_act(e1, enc["erb_conv2"], kernel_t=1, fstride=2)
    e3, _ = conv_norm_act(e2, enc["erb_conv3"], kernel_t=1, fstride=1)

    c0, h_s = conv_norm_act(xs, enc["df_conv0"], kernel_t=3,
                            hist=state.df_conv0_hist)
    c1, _ = conv_norm_act(c0, enc["df_conv1"], kernel_t=1, fstride=2)

    # [1,C,T,F] → [T, F*C] (freq-major flatten, torch permute(0,2,3,1).flatten(2))
    cemb = jnp.transpose(c1[0], (1, 2, 0)).reshape(T, -1)
    cemb = jax.nn.relu(grouped_linear(cemb, enc["df_fc_emb"]))
    emb = jnp.transpose(e3[0], (1, 2, 0)).reshape(T, -1)
    emb, h_enc = squeezed_gru(emb + cemb, enc["emb_gru"], state.enc_gru)
    lsnr = jax.nn.sigmoid(emb @ enc["lsnr"]["w"].T + enc["lsnr"]["b"])[:, 0]
    lsnr = lsnr * (LSNR_MAX - LSNR_MIN) + LSNR_MIN

    # --- ERB mask decoder (U-Net skips off e0..e3) ---
    embd, h_erb = squeezed_gru(emb, erb_dec["emb_gru"], state.erb_gru)
    embc = jnp.transpose(embd.reshape(T, NB_ERB // 4, CONV_CH), (2, 0, 1))[None]
    t3, _ = conv_norm_act(e3, erb_dec["conv3p"], kernel_t=1)
    d3, _ = conv_norm_act(t3 + embc, erb_dec["convt3"], kernel_t=1)
    t2, _ = conv_norm_act(e2, erb_dec["conv2p"], kernel_t=1)
    d2 = conv_transpose_norm_act(t2 + d3, erb_dec["convt2"], fstride=2)
    t1, _ = conv_norm_act(e1, erb_dec["conv1p"], kernel_t=1)
    d1 = conv_transpose_norm_act(t1 + d2, erb_dec["convt1"], fstride=2)
    t0, _ = conv_norm_act(e0, erb_dec["conv0p"], kernel_t=1)
    m, _ = conv_norm_act(t0 + d1, erb_dec["conv0_out"], kernel_t=1, act="sigmoid")
    erb_mask = m[0, 0]                               # [T, 32]

    # --- deep-filter decoder ---
    c, h_df = squeezed_gru(emb, df_dec["df_gru"], state.df_gru)
    cp, h_p = conv_norm_act(c0, df_dec["df_convp"], kernel_t=DF_PATHWAY_KT,
                            hist=state.df_convp_hist)
    cp = jnp.transpose(cp[0], (1, 2, 0))             # [T, 96, 10]
    cdf = jnp.tanh(grouped_linear(c, df_dec["df_out"]))
    coefs = (cdf.reshape(T, NB_DF, DF_ORDER * 2) + cp).reshape(T, NB_DF, DF_ORDER, 2)

    new_state = DfnState(
        erb_conv0_hist=h_e, df_conv0_hist=h_s, df_convp_hist=h_p,
        enc_gru=h_enc, erb_gru=h_erb, df_gru=h_df)
    return erb_mask, coefs, lsnr, new_state


def dfn3_forward(params, feat_erb, feat_spec):
    """Batch forward: applies the 2-frame lookahead shift (trim the first
    ``LOOKAHEAD`` frames, append zeros — reference
    AudioProcessing.swift:473-489).  The trimmed leading frames seed the
    input-conv histories so that output frame 0 sees features 0..2 exactly
    like the upstream asymmetric time pads do."""
    t = feat_erb.shape[0]
    dt = feat_erb.dtype
    shift_erb = jnp.concatenate(
        [feat_erb[LOOKAHEAD:], jnp.zeros((LOOKAHEAD,) + feat_erb.shape[1:], dt)])[:t]
    shift_spec = jnp.concatenate(
        [feat_spec[LOOKAHEAD:], jnp.zeros((LOOKAHEAD,) + feat_spec.shape[1:], dt)])[:t]
    lead_erb = jnp.concatenate(
        [feat_erb[:LOOKAHEAD], jnp.zeros((LOOKAHEAD,) + feat_erb.shape[1:], dt)])[:LOOKAHEAD]
    lead_spec = jnp.concatenate(
        [feat_spec[:LOOKAHEAD], jnp.zeros((LOOKAHEAD,) + feat_spec.shape[1:], dt)])[:LOOKAHEAD]
    state = init_state(dt)._replace(
        erb_conv0_hist=lead_erb[None, None],                      # [1,1,2,32]
        df_conv0_hist=jnp.moveaxis(lead_spec, -1, 0)[None])       # [1,2,2,96]
    mask, coefs, lsnr, _ = dfn3_step(params, shift_erb, shift_spec, state)
    return mask, coefs, lsnr


# ---------------------------------------------------------------------------
# random init (unit tests / CLI --random-weights)
# ---------------------------------------------------------------------------

def init_dfn3_params(key, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 64))

    def conv(o, i, kt, kf, bias=False, pw=True, bn=True):
        p = {"w": (jax.random.normal(next(keys), (o, i, kt, kf)) * 0.25
                   / np.sqrt(i * kt * kf)).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((o,), dtype)
        if pw:
            p["pw"] = (jax.random.normal(next(keys), (o, o, 1, 1)) / np.sqrt(o)).astype(dtype)
        if bn:
            p["bn"] = {"scale": jnp.ones((o,), dtype), "bias": jnp.zeros((o,), dtype),
                       "mean": jnp.zeros((o,), dtype), "var": jnp.ones((o,), dtype)}
        return p

    def glin(i, o, g):
        return (jax.random.normal(next(keys), (g, i // g, o // g)) / np.sqrt(i // g)).astype(dtype)

    def gru(i, h):
        return {"wi": (jax.random.normal(next(keys), (3 * h, i)) / np.sqrt(i)).astype(dtype),
                "wh": (jax.random.normal(next(keys), (3 * h, h)) / np.sqrt(h)).astype(dtype),
                "bi": jnp.zeros((3 * h,), dtype), "bh": jnp.zeros((3 * h,), dtype)}

    def sgru(i, h, o, layers):
        p = {"lin_in": glin(i, h, LIN_GROUPS),
             "gru": tuple(gru(h, h) for _ in range(layers))}
        if o is not None:
            p["lin_out"] = glin(h, o, LIN_GROUPS)
        return p

    c = CONV_CH
    return {
        "enc": {
            "erb_conv0": conv(c, 1, 3, 3, pw=False),
            "erb_conv1": conv(c, 1, 1, 3),
            "erb_conv2": conv(c, 1, 1, 3),
            "erb_conv3": conv(c, 1, 1, 3),
            "df_conv0": conv(c, 1, 3, 3),
            "df_conv1": conv(c, 1, 1, 3),
            "df_fc_emb": glin(c * NB_DF // 2, EMB_DIM, ENC_LIN_GROUPS),
            "emb_gru": sgru(EMB_DIM, EMB_HIDDEN, EMB_DIM, 1),
            "lsnr": {"w": (jax.random.normal(next(keys), (1, EMB_DIM)) / np.sqrt(EMB_DIM)).astype(dtype),
                     "b": jnp.zeros((1,), dtype)},
        },
        "erb_dec": {
            "emb_gru": sgru(EMB_DIM, EMB_HIDDEN, EMB_DIM, 2),
            "conv3p": conv(c, c, 1, 1, pw=False),
            "convt3": conv(c, 1, 1, 3),
            "conv2p": conv(c, c, 1, 1, pw=False),
            "convt2": conv(c, 1, 1, 3),
            "conv1p": conv(c, c, 1, 1, pw=False),
            "convt1": conv(c, 1, 1, 3),
            "conv0p": conv(c, c, 1, 1, pw=False),
            "conv0_out": conv(1, c, 1, 3, bias=True, pw=False, bn=False),
        },
        "df_dec": {
            "df_gru": sgru(EMB_DIM, DF_HIDDEN, None, 2),
            "df_out": glin(DF_HIDDEN, NB_DF * DF_ORDER * 2, LIN_GROUPS),
            "df_convp": conv(DF_ORDER * 2, c // 2, DF_PATHWAY_KT, 1),
        },
    }
