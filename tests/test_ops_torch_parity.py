"""Value parity of the sequential/attention primitives against their torch
counterparts (nn.LSTM, nn.MultiheadAttention, nn.TransformerEncoderLayer)
— the modules the reference builds its heads from."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from vqvaehmm_tpu.ops.attention import (encoder_layer, init_encoder_layer,
                                        init_mha, mha)
from vqvaehmm_tpu.ops.rnn import init_lstm, lstm


def test_lstm_matches_torch():
    B, T, D, H, L = 3, 11, 4, 6, 2
    params = init_lstm(jax.random.PRNGKey(0), D, H, L)

    ref = nn.LSTM(D, H, L, batch_first=True)
    with torch.no_grad():
        for layer in range(L):
            getattr(ref, f"weight_ih_l{layer}").copy_(
                torch.from_numpy(np.array(params[layer]["weight_ih"])))
            getattr(ref, f"weight_hh_l{layer}").copy_(
                torch.from_numpy(np.array(params[layer]["weight_hh"])))
            getattr(ref, f"bias_ih_l{layer}").copy_(
                torch.from_numpy(np.array(params[layer]["bias_ih"])))
            getattr(ref, f"bias_hh_l{layer}").copy_(
                torch.from_numpy(np.array(params[layer]["bias_hh"])))

    x = np.random.default_rng(0).normal(size=(B, T, D)).astype(np.float32)
    out_j, (h_j, c_j) = lstm(params, jnp.asarray(x))
    with torch.no_grad():
        out_t, (h_t, c_t) = ref(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_j), h_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_j), c_t.numpy(), atol=1e-5)


def test_mha_matches_torch():
    B, T, E, H = 2, 7, 8, 2
    params = init_mha(jax.random.PRNGKey(1), E, H)

    ref = nn.MultiheadAttention(E, H, batch_first=True)
    with torch.no_grad():
        ref.in_proj_weight.copy_(
            torch.from_numpy(np.array(params["in_proj_weight"])))
        ref.in_proj_bias.copy_(
            torch.from_numpy(np.array(params["in_proj_bias"])))
        ref.out_proj.weight.copy_(
            torch.from_numpy(np.array(params["out_proj"]["weight"])))
        ref.out_proj.bias.copy_(
            torch.from_numpy(np.array(params["out_proj"]["bias"])))

    x = np.random.default_rng(1).normal(size=(B, T, E)).astype(np.float32)
    out_j = mha(params, jnp.asarray(x), H)
    with torch.no_grad():
        out_t, _ = ref(torch.from_numpy(x), torch.from_numpy(x),
                       torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-5)


def test_transformer_encoder_layer_matches_torch():
    B, T, E, H, FF = 2, 6, 4, 1, 16
    params = init_encoder_layer(jax.random.PRNGKey(2), E, H, FF)

    ref = nn.TransformerEncoderLayer(E, H, FF, dropout=0.0,
                                     batch_first=True)
    ref.eval()
    with torch.no_grad():
        ref.self_attn.in_proj_weight.copy_(
            torch.from_numpy(np.array(params["self_attn"]
                                        ["in_proj_weight"])))
        ref.self_attn.in_proj_bias.copy_(
            torch.from_numpy(np.array(params["self_attn"]
                                        ["in_proj_bias"])))
        ref.self_attn.out_proj.weight.copy_(
            torch.from_numpy(np.array(params["self_attn"]["out_proj"]
                                        ["weight"])))
        ref.self_attn.out_proj.bias.copy_(
            torch.from_numpy(np.array(params["self_attn"]["out_proj"]
                                        ["bias"])))
        ref.linear1.weight.copy_(
            torch.from_numpy(np.array(params["linear1"]["weight"])))
        ref.linear1.bias.copy_(
            torch.from_numpy(np.array(params["linear1"]["bias"])))
        ref.linear2.weight.copy_(
            torch.from_numpy(np.array(params["linear2"]["weight"])))
        ref.linear2.bias.copy_(
            torch.from_numpy(np.array(params["linear2"]["bias"])))
        ref.norm1.weight.copy_(
            torch.from_numpy(np.array(params["norm1"]["weight"])))
        ref.norm1.bias.copy_(
            torch.from_numpy(np.array(params["norm1"]["bias"])))
        ref.norm2.weight.copy_(
            torch.from_numpy(np.array(params["norm2"]["weight"])))
        ref.norm2.bias.copy_(
            torch.from_numpy(np.array(params["norm2"]["bias"])))

    x = np.random.default_rng(2).normal(size=(B, T, E)).astype(np.float32)
    out_j = encoder_layer(params, jnp.asarray(x), H)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-4)
