"""Device-side epoch assembly: host samples indices, the chip gathers.

The reference feeds training through a host DataLoader that materializes
every padded batch in Python (VQ_VAE_HMM_fixed.py:164-179).  At TPU
training rates the host becomes the bottleneck: assembling a
(batches, B, C, T) epoch in numpy/C costs tens of MB of host writes per
epoch while the fused train step consumes it in ~1 ms.  The TPU-native
fix is to stop shipping *data* per epoch at all:

* the source sequence pool is uploaded ONCE, zero-padded to a static
  (N, C, Tpad) block;
* per epoch the host draws only the (seq_idx, start, length) integer
  triples — identical distribution (and, per seed, the identical stream)
  to RandomChunkDataset.__getitem__ — a few KB instead of tens of MB;
* a jitted vmapped dynamic-slice gather + length mask materializes the
  padded epoch entirely in HBM.

The resulting epoch tensors are bit-identical to the numpy host path
(tests/test_data.py::test_device_sampler_matches_host_path), so training
results are unchanged; only the host<->device traffic collapses.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dataset import RandomChunkDataset


def _gather_window(src, si, st, ln, max_len: int):
    """One (C, max_len) window from a padded (N, C, Tpad) pool, with the
    tail beyond `ln` zeroed (single source for both gather paths)."""
    seq = jnp.take(src, si, axis=0)                    # (C, Tpad)
    win = jax.lax.dynamic_slice(
        seq, (jnp.int32(0), st), (seq.shape[0], max_len))
    mask = (jnp.arange(max_len, dtype=jnp.int32) < ln)
    return win * mask[None, :].astype(win.dtype)


class DeviceEpochSampler:
    """Epoch producer with device-resident sources and on-device gather.

    All resident pools are built lazily: the fused token path
    (make_epoch_step(fused=True) on TPU) only ever touches token_pool(),
    so the dense (N,C,Tpad)/(N,U,Tpad) pools — up to 3x the dataset's
    bytes in a second layout — are neither assembled on the host nor
    uploaded unless a caller actually takes the XLA-gather path."""

    def __init__(self, dataset: RandomChunkDataset, device=None):
        self.dataset = dataset
        self.max_len = dataset.max_len
        self.min_len = dataset.min_len
        self.seq_lens = np.array([x.shape[1] for x in dataset.x_seqs],
                                 np.int32)
        self._device = device

        max_len = self.max_len

        def gather_epoch(xsrc, usrc, seq_idx, starts, lengths):
            # (nb, B) int32 each -> (nb, B, C, max_len) etc.  The vmap is
            # bounded at B and lax.map'd over batches: a flat nb*B-way
            # vmap at production epoch sizes (50k+ samples) crashes the
            # XLA compile at the gather's unrolled scatter/gather graph.
            gx = jax.vmap(_gather_window,
                          in_axes=(None, 0, 0, 0, None))

            def one_batch(inp):
                si, st, ln = inp
                return (gx(xsrc, si, st, ln, max_len),
                        gx(usrc, si, st, ln, max_len))

            x, u = jax.lax.map(one_batch, (seq_idx, starts, lengths))
            return x, u, lengths

        self._gather = jax.jit(gather_epoch)

    def dense_pools(self):
        """Lazily-built device-resident (N, C, Tpad) + (N, U, Tpad) pools
        for the XLA dynamic-slice gather path.  Every sequence is padded
        to Tmax + max_len so a max_len-wide dynamic_slice at any start
        <= seq_len never clamps (clamping would silently shift the
        window)."""
        if not hasattr(self, "_dense"):
            dataset = self.dataset
            n = len(dataset.x_seqs)
            C = dataset.x_seqs[0].shape[0]
            U = dataset.u_seqs[0].shape[0]
            tpad = int(self.seq_lens.max()) + self.max_len
            xsrc = np.zeros((n, C, tpad), np.float32)
            usrc = np.zeros((n, U, tpad), np.float32)
            for i, (xs, us) in enumerate(zip(dataset.x_seqs,
                                             dataset.u_seqs)):
                xsrc[i, :, :xs.shape[1]] = xs
                usrc[i, :, :us.shape[1]] = us
            # the first call may come from inside a jit trace (the lazy
            # XLA-gather branch); force a concrete eager upload so the
            # cached pools are real device arrays, never tracers
            with jax.ensure_compile_time_eval():
                self._dense = (
                    jax.device_put(jnp.asarray(xsrc), self._device),
                    jax.device_put(jnp.asarray(usrc), self._device))
        return self._dense

    @property
    def xsrc(self):
        return self.dense_pools()[0]

    @property
    def usrc(self):
        return self.dense_pools()[1]

    def token_pool_shape(self):
        """(N, CUP, TPAD) of token_pool() WITHOUT building it — the
        dispatch gate only needs the shape, so an epoch step that ends
        up on the XLA path never assembles or uploads the pool."""
        from ..ops.pallas_gather import pool_pad_t

        ds = self.dataset
        C = ds.x_seqs[0].shape[0]
        U = ds.u_seqs[0].shape[0]
        cup = -(-(C + U) // 8) * 8
        return (len(ds.x_seqs), cup,
                pool_pad_t(int(self.seq_lens.max()), self.max_len))

    def token_pool(self):
        """Lazily-built stacked (N, CUP, TPAD) pool for the Pallas
        window-gather kernel (ops/pallas_gather.py layout contract)."""
        if not hasattr(self, "_token_pool"):
            from ..ops.pallas_gather import build_token_pool

            with jax.ensure_compile_time_eval():
                self._token_pool = jnp.asarray(build_token_pool(
                    self.dataset.x_seqs, self.dataset.u_seqs,
                    self.max_len))
            assert self._token_pool.shape == self.token_pool_shape()
        return self._token_pool

    def sample_indices(self, batch_size: int,
                       num_batches: Optional[int] = None
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Host-side index triples, drawn with the dataset's own rng in
        the exact per-item order __getitem__ uses, so a given seed yields
        the same sample stream as the numpy host path."""
        ds = self.dataset
        if num_batches is None:
            num_batches = len(ds) // batch_size
        n_items = num_batches * batch_size
        seq_idx = np.empty(n_items, np.int32)
        starts = np.empty(n_items, np.int32)
        lengths = np.empty(n_items, np.int32)
        for i in range(n_items):
            si = int(ds.rng.integers(0, len(ds.x_seqs)))
            seq_len = int(self.seq_lens[si])
            hi = min(ds.max_len, seq_len)
            ln = int(ds.rng.integers(ds.min_len, hi + 1))
            st = int(ds.rng.integers(0, seq_len - ln + 1))
            seq_idx[i], starts[i], lengths[i] = si, st, ln
        shape = (num_batches, batch_size)
        return (seq_idx.reshape(shape), starts.reshape(shape),
                lengths.reshape(shape))

    def sample_indices_fast(self, batch_size: int,
                            num_batches: Optional[int] = None
                            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Vectorized index draws: the same distribution as
        sample_indices but one rng call per field instead of one per item
        (~3 orders of magnitude less host work — the per-item loop would
        itself bottleneck a fused TPU train step).  The sample STREAM
        differs from the numpy path for a given seed; distribution is
        identical (mirrors the native C sampler's contract,
        data/dataset.py::epoch_arrays use_native)."""
        ds = self.dataset
        if num_batches is None:
            num_batches = len(ds) // batch_size
        n = num_batches * batch_size
        si = ds.rng.integers(0, len(ds.x_seqs), size=n)
        seq_len = self.seq_lens[si].astype(np.int64)
        hi = np.minimum(ds.max_len, seq_len)
        ln = ds.rng.integers(ds.min_len, hi + 1)
        st = ds.rng.integers(0, seq_len - ln + 1)
        shape = (num_batches, batch_size)
        return (si.astype(np.int32).reshape(shape),
                st.astype(np.int32).reshape(shape),
                ln.astype(np.int32).reshape(shape))

    def make_epoch_step(self, model, tx, fused: bool = False,
                        donate: bool = True, mesh=None,
                        use_pallas_gather: Optional[bool] = None):
        """Epoch trainer with the gather fused INTO the training scan:
        each scan iteration gathers its batch from the resident source
        pool and applies one optimizer update, all inside ONE jitted
        call per epoch.

        This removes both residual costs of the two-call design
        (gather-epoch dispatch + a (batches, B, C, T) epoch buffer in
        HBM): the host ships only three (batches, B) int32 index arrays
        per epoch.  Returns step(state, seq_idx, starts, lengths, beta)
        -> (state, mean_loss); feed it `sample_indices_fast` output.

        mesh: data-parallel execution — the (batches, B) index arrays
        shard over the data axis on their batch dim (bulk bytes stay
        replicated in the resident pool; gathers are chip-local, and the
        gradient all-reduce comes from the sharded update as usual).

        With fused=True the per-step gather runs through the Pallas
        window-gather kernel (ops/pallas_gather.py) emitting the train
        kernel's token layout directly — measured end-to-end goodput
        matches device-resident training to ~1% (vs 48% through the XLA
        vmap'd dynamic_slice gather; BENCH_NOTES "Pallas gather").
        Under a mesh the gather runs per-shard inside shard_map on the
        local index slice (the pool is replicated; normalizations and
        gradients psum globally exactly as in the unsharded step).
        use_pallas_gather: None = auto (TPU + supported shapes), True =
        force (tests/interpret), False = XLA gather.
        """
        import jax
        from jax import lax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..ops import pallas_gather as pg
        from ..train.trainer import _apply_grads, _sgd_update

        sampler = self
        max_len = self.max_len
        cfg = model.cfg
        C, U = cfg.input_dim, cfg.u_dim
        C_ds = self.dataset.x_seqs[0].shape[0]
        U_ds = self.dataset.u_seqs[0].shape[0]
        if (C, U) != (C_ds, U_ds):
            # the token layout slices tok[:C]/tok[C:C+U] by the MODEL's
            # dims; a mismatch with the dataset's channel counts would
            # silently feed u rows as x channels (the XLA path fails
            # loudly on weight shapes instead)
            raise ValueError(
                f"model (input_dim={C}, u_dim={U}) does not match the "
                f"dataset's channel counts (C={C_ds}, U={U_ds})")
        tp_shape = self.token_pool_shape() if fused else None
        interpret = jax.default_backend() != "tpu"

        def gather_batch(src, si, st, ln):
            return jax.vmap(_gather_window,
                            in_axes=(None, 0, 0, 0, None))(
                src, si, st, ln, max_len)

        def epoch(state, seq_idx, starts, lengths, beta):
            B = seq_idx.shape[1]
            B_local = B if mesh is None else B // mesh.shape["data"]
            supported = (tp_shape is not None
                         and pg.gather_supported(tp_shape, B_local,
                                                 max_len))
            if use_pallas_gather and not supported:
                # forcing an unsupported shape must be loud: a silent
                # XLA fallback makes forced parity tests vacuous and
                # benchmarks measure the wrong path
                raise ValueError(
                    f"use_pallas_gather=True forced but the window "
                    f"gather does not support B_local={B_local}, "
                    f"T={max_len}, pool {tp_shape}")
            use_pg = (supported
                      and use_pallas_gather is not False
                      and (use_pallas_gather or not interpret))

            def tokens_update(st, si, stt, ln, bb):
                from ..ops.pallas_train import fused_loss_and_grads

                # the pool is built/uploaded lazily, only when the
                # Pallas token path is actually taken
                token_pool = sampler.token_pool()

                def per_shard(p, si_s, st_s, ln_s, bb_s):
                    toks = pg.gather_tokens(token_pool, si_s, st_s, ln_s,
                                            max_len, C, U,
                                            interpret=interpret)
                    return fused_loss_and_grads(
                        model, p, None, None, ln_s, bb_s,
                        axis_name="data" if mesh is not None else None,
                        tokens=toks)

                if mesh is None:
                    loss, grads = per_shard(st.params, si, stt, ln, bb)
                else:
                    from jax import shard_map

                    loss, grads = shard_map(
                        per_shard, mesh=mesh,
                        in_specs=(P(), P("data"), P("data"), P("data"),
                                  P()),
                        out_specs=(P(), P()), check_vma=False,
                    )(st.params, si, stt, ln, bb)
                return _apply_grads(tx, st, grads), loss

            def body(st, inp):
                si, stt, ln = inp                      # (B,) each
                if use_pg:
                    st, loss = tokens_update(st, si, stt, ln, beta)
                else:
                    # dense pools are built lazily here, at trace time,
                    # only when this branch is actually taken
                    xsrc, usrc = sampler.dense_pools()
                    x = gather_batch(xsrc, si, stt, ln)  # (B, C, max_len)
                    u = gather_batch(usrc, si, stt, ln)
                    st, loss = _sgd_update(model, tx, st, x, u, ln, beta,
                                           fused=fused, mesh=mesh)
                return st, loss

            state, losses = lax.scan(body, state,
                                     (seq_idx, starts, lengths))
            return state, losses.mean()

        donate_argnums = (0,) if donate else ()
        if mesh is None:
            return jax.jit(epoch, donate_argnums=donate_argnums)
        repl = NamedSharding(mesh, P())
        idx = NamedSharding(mesh, P(None, "data"))
        return jax.jit(epoch,
                       in_shardings=(repl, idx, idx, idx, repl),
                       out_shardings=(repl, repl),
                       donate_argnums=donate_argnums)

    def epoch(self, batch_size: int, num_batches: Optional[int] = None,
              exact_stream: bool = True):
        """(x:(N,B,C,max_len), u:(N,B,U,max_len), lengths:(N,B)) device
        arrays for one epoch — same contract as data.dataset.epoch_arrays
        but assembled in HBM.  exact_stream=True reproduces the numpy host
        path's sample stream bit-for-bit (per-item draws);
        exact_stream=False uses the vectorized host draws (same
        distribution, negligible host cost — the production setting)."""
        draw = (self.sample_indices if exact_stream
                else self.sample_indices_fast)
        seq_idx, starts, lengths = draw(batch_size, num_batches)
        return self._gather(self.xsrc, self.usrc,
                            jnp.asarray(seq_idx), jnp.asarray(starts),
                            jnp.asarray(lengths))
