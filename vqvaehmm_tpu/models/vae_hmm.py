"""Canonical VAE-HMM regime-detection model, TPU-native.

This is the single canonical implementation replacing the reference's three
generations of the same model (VQ_VAE_HMM_fixed.py:31-143 — canonical;
src/models/vae_hmm.py:8-126 and VI_HMM.py:7-153 — duplicates; see SURVEY.md
"Duplicate-code topology").  Semantics follow VQ_VAE_HMM_fixed.py exactly:

* Encoder: Conv1d(k=3, SAME) + ReLU x2 -> 1x1 Conv to K regime logits over
  time; x:(B,C,T) -> logits:(B,K,T)          (reference :31-41)
* Prior: learnable initial logits + MLP u_t -> KxK row-log-softmax giving a
  time-varying transition tensor log_A:(B,T,K,K)   (reference :43-71)
* Decoder: soft codebook lookup e = q^T E, Conv1d stack -> (mu, logvar)
  Gaussian emission parameters                 (reference :73-90)
* compute_loss: masked negative ELBO with the reference's exact three
  normalizations (recon / (mask.sum()*C); prior batch-mean; entropy / B)
  (reference :106-137) — parity target <=1e-4 per BASELINE.json.

Design is functional: a `VAEHMM` object holds only the static ModelConfig;
parameters live in an explicit pytree, so every method is jit/pjit/vmap/grad
transparent.  Arrays keep the reference's public (B, C, T) layout; XLA picks
TPU-internal layouts.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..core.masking import length_mask, pairwise_mask
from ..ops import nn as ops
from ..ops.precise import pexp, plog, plog_softmax, psoftmax

Params = Dict


def _under_autodiff(*trees) -> bool:
    """True when any leaf carries an autodiff tracer (jax.grad/jvp/vjp in
    flight), including AD tracers WRAPPED inside other tracers (e.g. a
    BatchTracer around a JVPTracer under vmap-of-grad).  Auto-dispatch
    gates on this because the Pallas kernels have no VJP — differentiating
    callers must get the XLA path, not an error.

    Detection is belt-and-braces: (a) isinstance against JVPTracer /
    LinearizeTracer (the classes jax's grad machinery has used across
    versions), (b) duck-typing on a `.tangent` attribute (every JVP-style
    tracer carries one, surviving class renames), and (c) recursive
    unwrapping through `.val` / `.primal` so nesting under other
    transforms cannot hide the AD tracer."""
    try:
        from jax._src.interpreters import ad as _ad

        types = tuple(t for t in (getattr(_ad, "JVPTracer", None),
                                  getattr(_ad, "LinearizeTracer", None))
                      if t is not None)
    except ImportError:  # pragma: no cover - private module moved
        types = ()

    def is_ad(leaf) -> bool:
        stack, seen = [leaf], set()
        while stack:
            t = stack.pop()
            if id(t) in seen or not isinstance(t, jax.core.Tracer):
                continue
            seen.add(id(t))
            if types and isinstance(t, types):
                return True
            if getattr(t, "tangent", None) is not None:
                return True
            for attr in ("val", "primal"):
                inner = getattr(t, attr, None)
                if isinstance(inner, jax.core.Tracer):
                    stack.append(inner)
        return False

    return any(is_ad(leaf) for tree in trees
               for leaf in jax.tree_util.tree_leaves(tree))


class VAEHMM:
    """Mean-field VAE with an input-conditioned HMM prior over K regimes."""

    def __init__(self, cfg: ModelConfig):
        if cfg.u_dim is None:
            # The reference deliberately raises here
            # (VQ_VAE_HMM_fixed.py:50-51).  Stationary transitions are
            # supported by the standalone HMM module (models/hmm.py) instead.
            raise ValueError(
                "Stationary transitions not implemented in VAEHMM; use "
                "vqvaehmm_tpu.models.hmm.HiddenMarkovModel for stationary "
                "chains, or pass u_dim.")
        self.cfg = cfg
        self.precision = ops.resolve_precision(cfg.matmul_precision)
        self.conv_impl = getattr(cfg, "conv_impl", "conv")
        # bf16 activations halve the activation traffic of the
        # memory-bound train step (params/optimizer/loss math stay f32);
        # parity mode keeps float32.
        self.compute_dtype = jnp.bfloat16 \
            if getattr(cfg, "compute_dtype", "float32") == "bfloat16" \
            else jnp.float32

    def _cast_in(self, a):
        return a.astype(self.compute_dtype) \
            if a.dtype != self.compute_dtype else a

    def _cast_params(self, p):
        if self.compute_dtype == jnp.float32:
            return p
        return jax.tree_util.tree_map(
            lambda a: a.astype(self.compute_dtype), p)

    # ------------------------------------------------------------------
    # Parameters
    # ------------------------------------------------------------------

    def init(self, key: jax.Array) -> Params:
        cfg = self.cfg
        keys = jax.random.split(key, 9)
        enc = {
            "conv1": ops.init_conv1d(keys[0], cfg.input_dim, cfg.hidden_dim, 3),
            "conv2": ops.init_conv1d(keys[1], cfg.hidden_dim, cfg.hidden_dim2, 3),
            "to_logits": ops.init_conv1d(keys[2], cfg.hidden_dim2, cfg.K, 1),
        }
        prior = {
            "log_prior": jnp.zeros((cfg.K,), jnp.float32),
            "fc1": ops.init_linear(keys[3], cfg.u_dim, cfg.trans_hidden),
            "fc2": ops.init_linear(keys[4], cfg.trans_hidden, cfg.K * cfg.K),
        }
        # Decoder latent dim == hidden_dim (reference ctor wires
        # Decoder(K, hidden_dim, hidden_dim, input_dim) at :98).
        dec = {
            "embeddings": ops.init_embedding(keys[5], cfg.K, cfg.hidden_dim),
            "conv1": ops.init_conv1d(keys[6], cfg.hidden_dim, cfg.hidden_dim, 3),
            "conv2": ops.init_conv1d(keys[7], cfg.hidden_dim, cfg.hidden_dim, 3),
            "to_params": ops.init_conv1d(keys[8], cfg.hidden_dim,
                                         cfg.input_dim * 2, 1),
        }
        return {"encoder": enc, "prior": prior, "decoder": dec}

    # ------------------------------------------------------------------
    # Sub-modules
    # ------------------------------------------------------------------

    @staticmethod
    def _time_bound_mask(T: int, valid_to, dtype):
        """Mask zeroing t >= valid_to: (1,1,T) for scalar valid_to, or
        (B,1,T) when valid_to is a per-sequence (B,) vector (used by the
        serving micro-batcher so requests of different lengths batched
        together each keep their own bound — bit-identical to solo).

        Why this exists: the reference pads each batch to the *batch max*
        length, so the longest row's conv stack sees the array boundary at
        t = max(lengths).  Under fixed-length padding (our static-shape
        batching), stacked SAME convs would otherwise leak activations from
        t >= max(lengths) back into t = max(lengths)-1 via the second
        conv's receptive field, breaking exact (<=1e-4) parity.  Masking
        intermediate activations at t >= valid_to makes fixed-length
        padding bit-equivalent to the reference's batch-max padding.
        """
        vt = jnp.asarray(valid_to)
        if vt.ndim == 0:
            return (jnp.arange(T) < vt).astype(dtype)[None, None, :]
        return (jnp.arange(T)[None, :] < vt[:, None]).astype(dtype)[:, None, :]

    def encode(self, params: Params, x: jnp.ndarray,
               valid_to=None, fused: bool = False) -> jnp.ndarray:
        """x:(B,C,T) -> regime logits (B,K,T).

        valid_to (optional scalar): treat the time axis as ending there
        (see _time_bound_mask).  Without it the full array is the sequence,
        matching reference behaviour for exactly-sized inputs.

        fused=True runs the whole conv stack as one VMEM-resident Pallas
        kernel (ops/pallas_encoder.py) — inference path only (no grads).
        """
        if fused:
            from ..ops.pallas_encoder import fused_encode

            return fused_encode(
                params, x, valid_to=valid_to,
                highest=self.cfg.matmul_precision == "highest")
        p = self._cast_params(params["encoder"])
        x = self._cast_in(x)
        if valid_to is not None:
            # mask x itself, not just the intermediates: conv1's k=3 SAME
            # output at t = valid_to-1 reads x[valid_to], so a caller
            # whose tail is NOT zero (e.g. x sliced from a longer panel)
            # would otherwise leak it into the valid region (no-op for
            # the zero-padded producers in data/ and serve/)
            x = x * self._time_bound_mask(x.shape[-1], valid_to, x.dtype)
        h = jax.nn.relu(ops.conv1d_same(p["conv1"], x, precision=self.precision, impl=self.conv_impl))
        if valid_to is not None:
            h = h * self._time_bound_mask(h.shape[-1], valid_to, h.dtype)
        h = jax.nn.relu(ops.conv1d_same(p["conv2"], h, precision=self.precision, impl=self.conv_impl))
        out = ops.conv1d_same(p["to_logits"], h, precision=self.precision, impl=self.conv_impl)
        return out.astype(jnp.float32)

    def prior(self, params: Params,
              u: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """u:(B,U,T) or (B,T,U) -> (log_pi:(K,), log_A:(B,T,K,K)).

        Accepts both layouts via the reference's dim-sniffing rule
        (VQ_VAE_HMM_fixed.py:64-65): if dim 1 equals u_dim, treat as (B,U,T).
        """
        cfg = self.cfg
        p = self._cast_params(params["prior"])
        if u is None:
            raise ValueError("u required for non-stationary transitions")
        if u.ndim == 3 and u.shape[1] == cfg.u_dim:
            u = jnp.transpose(u, (0, 2, 1))
        u = self._cast_in(u)
        B, T, _ = u.shape
        logits = ops.mlp2(p["fc1"], p["fc2"], u,
                          precision=self.precision).astype(jnp.float32)
        # plog_softmax, not jax.nn.log_softmax: this XLA build's fast-math
        # log costs ~1.2e-4 of accuracy, which alone breaks the <=1e-4
        # parity bar (see ops/precise.py).
        log_A = plog_softmax(logits.reshape(B, T, cfg.K, cfg.K), axis=-1)
        # read log_prior from the UNCAST params: it is K floats used in no
        # matmul, so a bf16 round-trip through _cast_params would cost
        # ~16 mantissa bits of the learned init logits for zero savings
        log_pi = plog_softmax(
            params["prior"]["log_prior"].astype(jnp.float32))
        return log_pi, log_A

    def decode(self, params: Params, q: jnp.ndarray,
               valid_to=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """q:(B,K,T) soft assignments -> Gaussian (mu, logvar), each (B,C,T).

        valid_to: see encode — zeroes e and intermediate activations at
        t >= valid_to so fixed-length padding matches batch-max padding.
        """
        p = self._cast_params(params["decoder"])
        q = self._cast_in(q)
        # Soft codebook lookup e = q^T E  (reference :83); contraction over K.
        e = jnp.einsum("bkt,kd->bdt", q, p["embeddings"]["weight"],
                       precision=self.precision)
        if valid_to is not None:
            tmask = self._time_bound_mask(e.shape[-1], valid_to, e.dtype)
            e = e * tmask
        h = jax.nn.relu(ops.conv1d_same(p["conv1"], e, precision=self.precision, impl=self.conv_impl))
        if valid_to is not None:
            h = h * tmask
        h = jax.nn.relu(ops.conv1d_same(p["conv2"], h, precision=self.precision, impl=self.conv_impl))
        out = ops.conv1d_same(p["to_params"], h, precision=self.precision,
                              impl=self.conv_impl).astype(jnp.float32)
        mid = out.shape[1] // 2
        return out[:, :mid, :], out[:, mid:, :]

    # ------------------------------------------------------------------
    # Loss / forward
    # ------------------------------------------------------------------

    def compute_loss(self, params: Params, x: jnp.ndarray,
                     u: Optional[jnp.ndarray] = None,
                     lengths: Optional[jnp.ndarray] = None,
                     beta: jnp.ndarray | float = 1.0) -> jnp.ndarray:
        """Masked negative ELBO (reference: VQ_VAE_HMM_fixed.py:106-137).

        Identical term-by-term normalization:
          recon    = sum(masked Gaussian NLL) / max(mask.sum()*C, 1)
          prior    = -mean_B(init + masked transition cross terms)
          entropy  = sum(masked q-entropy) / B
          loss     = recon + beta * (prior - entropy)
        """
        if lengths is None:
            raise ValueError("lengths required")
        B, C, T = x.shape
        mask = length_mask(lengths, T)  # (B,T) bool

        # Emulate the reference's batch-max padding exactly under our
        # fixed-length batching (see _time_bound_mask).
        valid_to = jnp.max(lengths)
        log_pi, log_A = self.prior(params, u)
        logits = self.encode(params, x, valid_to=valid_to)
        log_q = plog_softmax(logits, axis=1)
        q = pexp(log_q)
        mu, logvar = self.decode(params, q, valid_to=valid_to)

        # Reconstruction: Gaussian NLL with var clamp (reference :118-120).
        var = jnp.maximum(pexp(logvar), 1e-8)
        nll = 0.5 * (plog(2.0 * math.pi * var) + (mu - x) ** 2 / var)
        maskf = mask.astype(x.dtype)
        denom = jnp.maximum(maskf.sum() * C, 1.0)
        recon_loss = (nll * maskf[:, None, :]).sum() / denom

        # HMM prior expectation under the mean-field posterior
        # (reference :123-131).
        init_loss = (q[:, :, 0] * log_pi[None, :]).sum(axis=1)  # (B,)
        trans = jnp.einsum("bit,bjt,btij->bt",
                           q[:, :, :-1], q[:, :, 1:], log_A[:, 1:],
                           precision=self.precision)  # (B,T-1)
        tmask = pairwise_mask(mask).astype(x.dtype)
        trans_loss = (trans * tmask).sum(axis=1)
        prior_loss = -(init_loss + trans_loss).mean()

        # Entropy of q, masked, divided by B (reference :134-135).
        entropy = -(q * log_q).sum(axis=1)  # (B,T)
        entropy = (entropy * maskf).sum() / B

        return recon_loss + beta * (prior_loss - entropy)

    def __call__(self, params: Params, x: jnp.ndarray):
        """Forward pass: ((mu, logvar), q)  (reference :139-143)."""
        logits = self.encode(params, x)
        q = psoftmax(logits, axis=1)
        mu, logvar = self.decode(params, q)
        return (mu, logvar), q

    forward = __call__

    def sample(self, params: Params, u: jnp.ndarray, key: jax.Array,
               sample_obs: bool = True
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Generative ancestral rollout: (states (B,T) int32, x (B,C,T)).

        Samples a regime path from the input-conditioned prior chain
        p(z | u) (exact categorical draws through ops/hmm.sample) and
        decodes it through the Gaussian emission model — one-hot states
        are a point on the simplex, so the soft codebook lookup reduces
        to the sampled regime's embedding row.  sample_obs=False returns
        the emission mean instead of a draw.  Capability the reference
        never implements for the VAE stack (its design sketch only
        samples the VQ stack, pseudocode.txt:30-32 — models/vqvae_hmm.py
        covers that path)."""
        from ..ops import hmm as hmm_ops

        log_pi, log_A = self.prior(params, u)     # (K,), (B,T,K,K)
        B, T = log_A.shape[0], log_A.shape[1]
        kz, kx = jax.random.split(key)
        states = hmm_ops.sample(kz, log_pi, log_A, T, batch=B)
        q = jax.nn.one_hot(states, self.cfg.K, axis=1,
                           dtype=jnp.float32)     # (B,K,T)
        mu, logvar = self.decode(params, q)
        if not sample_obs:
            return states, mu
        std = pexp(0.5 * logvar)
        x = mu + std * jax.random.normal(kx, mu.shape, mu.dtype)
        return states, x

    def posterior(self, params: Params, x: jnp.ndarray,
                  fused: Optional[bool] = None) -> jnp.ndarray:
        """Mean-field regime posterior q:(B,K,T) = softmax(encode(x)).

        fused=None auto-dispatches the VMEM-resident encoder kernel
        (ops/pallas_encoder.py) on TPU when shapes qualify — the
        backtester's posterior extraction hot path; explicit True/False
        forces a path.  The kernel has no VJP, so auto-dispatch steps
        aside when x or params is an autodiff tracer (jax.grad through
        posterior() then takes the XLA path instead of raising)."""
        if fused is None:
            from ..ops.pallas_encoder import encode_supported

            B, _, T = x.shape
            # compute_dtype gate: the kernel computes in f32, so for a
            # bf16-activation model auto-switching would silently change
            # numeric class between qualifying and non-qualifying shapes
            fused = (jax.default_backend() == "tpu"
                     and self.compute_dtype == jnp.float32
                     and encode_supported(self.cfg, B, T)
                     and not _under_autodiff(params, x))
        return psoftmax(self.encode(params, x, fused=fused), axis=1)

    def infer_forward(self, params: Params, x: jnp.ndarray,
                      valid_to=None, use_pallas: Optional[bool] = None,
                      mesh=None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """The serving forward (mu, logvar, q) — encode -> precise softmax
        -> decode — with valid_to as a scalar or per-sequence (B,) vector.

        use_pallas=None auto-dispatches: on TPU, qualifying shapes run the
        fully fused VMEM-resident kernel (ops/pallas_infer.py — the XLA
        forward is memory-bound and costs more than the fused TRAIN step
        at B=64; BENCH_NOTES.md 'Serving forward'); other shapes and
        other backends use the XLA path.

        mesh: bulk scoring across chips — the batch axis is sharded over
        the mesh's 'data' axis via shard_map (XLA cannot partition the
        Pallas kernel itself), each shard taking its own fused/XLA
        dispatch.  The forward has no cross-sequence math, so no
        collectives are needed; B must divide the data axis."""
        if mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            vt = None if valid_to is None else jnp.asarray(valid_to)
            if vt is None:
                def per_shard(p, xx):
                    return self.infer_forward(p, xx, use_pallas=use_pallas)

                in_specs = (P(), P("data"))
                args = (params, x)
            else:
                def per_shard(p, xx, v):
                    return self.infer_forward(p, xx, valid_to=v,
                                              use_pallas=use_pallas)

                in_specs = (P(), P("data"),
                            P("data") if vt.ndim else P())
                args = (params, x, vt)
            return shard_map(per_shard, mesh=mesh, in_specs=in_specs,
                             out_specs=(P("data"),) * 3,
                             check_vma=False)(*args)
        forced = use_pallas is True
        if use_pallas is None:
            # compute_dtype gate: see posterior() — the kernel is f32.
            # autodiff gate: the kernel has no VJP, so differentiating
            # callers (e.g. input attribution through the serving
            # forward) must get the XLA path, not an error.
            use_pallas = (jax.default_backend() == "tpu"
                          and self.compute_dtype == jnp.float32
                          and not _under_autodiff(params, x))
        if use_pallas:
            from ..ops.pallas_infer import fused_forward, supported

            B, _, T = x.shape
            if supported(self.cfg, B, T):
                return fused_forward(self, params, x, valid_to=valid_to)
            if forced:
                raise ValueError(
                    f"use_pallas=True forced but the fused serving "
                    f"forward does not support B={B}, T={T} with this "
                    "config (see ops/pallas_infer.supported)")
        logits = self.encode(params, x, valid_to=valid_to)
        q = psoftmax(logits, axis=1)
        mu, logvar = self.decode(params, q, valid_to=valid_to)
        return mu, logvar, q

    def _evidence_inputs(self, params: Params, x: jnp.ndarray,
                         u: jnp.ndarray, lengths, use_pallas):
        """(log_pi, log_A, log_obs) for the exact-inference paths; on TPU
        the fused evidence kernel (ops/pallas_decode.py) computes all
        three in one pass when shapes qualify.

        Auto-dispatch (use_pallas=None) never takes the evidence kernel:
        at MATCHED matmul precision the XLA evidence wins at both
        settings (99.0 vs 113.6 us smoothed-e2e at "default", 132.6 vs
        137.9 at "highest" — BENCH_NOTES.md "fused evidence, fair
        comparison"; the kernel's earlier 1.2-1.5x lead was measured
        against an XLA path running at a HIGHER precision than the
        kernel).  use_pallas=True still forces it, and the same
        _evidence_rows fusion remains the winning basis of the fully
        fused DECODE kernel (3-4x either way)."""
        if use_pallas is None:
            use_pallas = False
        if use_pallas:
            from ..ops.pallas_decode import fused_evidence, supported

            B, _, T = x.shape
            if supported(B, T, self.cfg):
                return fused_evidence(self, params, x, u, lengths)
            raise ValueError(
                f"use_pallas=True forced but the fused evidence kernel "
                f"does not support B={B}, T={T} with this config "
                "(see ops/pallas_decode.supported)")
        log_pi, log_A = self.prior(params, u)
        log_obs = self._hmm_evidence(params, x, lengths)
        return log_pi, log_A, log_obs

    def smoothed_posterior(self, params: Params, x: jnp.ndarray,
                           u: jnp.ndarray,
                           lengths: Optional[jnp.ndarray] = None,
                           use_pallas: Optional[bool] = None
                           ) -> jnp.ndarray:
        """Temporally-smoothed regime posterior (B,K,T): forward-backward
        over the Prior's input-conditioned transitions with the encoder's
        log-softmax evidence as emissions.

        Capability upgrade the reference lacks entirely (its posterior is
        the mean-field q and its decode is argmax(q) — SURVEY.md 'HMM
        inference — critical finding').  Smoothing injects the learned
        temporal dynamics into the per-step posterior, suppressing
        single-step regime flickers.
        """
        from ..ops import hmm as hmm_ops

        log_pi, log_A, log_obs = self._evidence_inputs(
            params, x, u, lengths, use_pallas)
        gamma = hmm_ops.posterior_marginals(log_pi, log_A, log_obs, lengths)
        return jnp.transpose(gamma, (0, 2, 1))

    def _hmm_evidence(self, params: Params, x: jnp.ndarray,
                      lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Encoder evidence (B,T,K) for the exact-inference paths, with the
        encoder bounded at max(lengths) so results do not depend on how much
        padding the input carries (same valid_to semantics as
        compute_loss / the serving mean-field path)."""
        valid_to = jnp.max(lengths) if lengths is not None else None
        logits = self.encode(params, x, valid_to=valid_to)
        return jnp.transpose(plog_softmax(logits, axis=1), (0, 2, 1))

    def filtered_posterior(self, params: Params, x: jnp.ndarray,
                           u: jnp.ndarray,
                           lengths: Optional[jnp.ndarray] = None,
                           use_pallas: Optional[bool] = None
                           ) -> jnp.ndarray:
        """Filtering regime posterior (B,K,T) — the online counterpart of
        smoothed_posterior: the HMM recursion uses only evidence up to t.

        CAVEAT: the conv encoder's emissions themselves have a 2-step
        lookahead (two stacked k=3 SAME convs), so the overall estimate at
        t depends on x up to t+2.  For a strictly causal live-trading
        signal, lag the output by 2 steps (or use a causal encoder); the
        HMM recursion adds no lookahead beyond the encoder's.
        """
        from ..ops import hmm as hmm_ops

        log_pi, log_A, log_obs = self._evidence_inputs(
            params, x, u, lengths, use_pallas)
        alpha = hmm_ops.filtered_marginals(log_pi, log_A, log_obs, lengths)
        return jnp.transpose(alpha, (0, 2, 1))

    def viterbi_decode(self, params: Params, x: jnp.ndarray,
                       u: jnp.ndarray,
                       lengths: Optional[jnp.ndarray] = None,
                       use_pallas: Optional[bool] = None) -> jnp.ndarray:
        """MAP regime path (B, T) under the Prior's transition dynamics —
        exact Viterbi instead of the reference's argmax(q) hard decode
        (reference: backtesting.py:155).

        use_pallas=None auto-dispatches: on TPU the decode runs two-stage
        — XLA evidence (which wins matched-precision comparisons) feeding
        the fused doubling-scan Viterbi recursion kernel
        (ops/pallas_hmm.py).  Measured end-to-end at B=64/T=200 this
        beats BOTH the lax.scan path (52.6 vs 206.4 us at "highest",
        21.2 vs 181.1 at "default") and the fully fused one-kernel decode
        (64.4 / 44.3 us — its in-kernel evidence pays the same cost the
        standalone evidence kernel did; BENCH_NOTES.md "decode dispatch,
        matched precision").  The one-kernel path stays available as
        ops.pallas_decode.fused_viterbi_states.  Off-TPU the scan path
        avoids interpret-mode overhead.

        T past the monolithic kernel's VMEM bound (whole-panel decodes,
        T~2000+) routes to the chunked kernel (viterbi_pallas_tiled)
        instead of falling back to the scan path."""
        from ..ops import hmm as hmm_ops

        if use_pallas is None:
            from ..ops.pallas_hmm import viterbi_dispatchable

            # viterbi_dispatchable bounds backend, dtype, lane tiling and
            # VMEM beside the kernels (one gate, not per-call-site
            # copies); the autodiff gate stays here — the kernels have no
            # VJP, so a differentiated computation embedding the decode
            # must trace the scan path.
            use_pallas = (viterbi_dispatchable(x.shape[2], self.cfg.K,
                                               self.compute_dtype)
                          and not _under_autodiff(params, x, u))
        log_pi, log_A = self.prior(params, u)
        log_obs = self._hmm_evidence(params, x, lengths)
        if use_pallas:
            from ..ops.pallas_hmm import viterbi_auto

            return viterbi_auto(log_pi, log_A, log_obs, lengths).states
        return hmm_ops.viterbi(log_pi, log_A, log_obs, lengths).states


def make_model(input_dim=5, hidden_dim=64, K=3, hidden_dim2=32, u_dim=4,
               trans_hidden=128, **kw) -> VAEHMM:
    """Positional-compatible factory mirroring the reference constructor
    VAE_HMM(input_dim, hidden_dim, K, hidden_dim2, u_dim, trans_hidden)."""
    return VAEHMM(ModelConfig(input_dim=input_dim, hidden_dim=hidden_dim, K=K,
                              hidden_dim2=hidden_dim2, u_dim=u_dim,
                              trans_hidden=trans_hidden, **kw))
