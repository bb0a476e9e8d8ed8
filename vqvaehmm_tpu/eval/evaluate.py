"""Evaluation CLI: masked reconstruction MSE over a dataset
(reference: evaluation/evaluate.py:39-106).

Rebuilds the model from config, loads a checkpoint (.npz export or a
reference torch .pt state_dict), evaluates masked recon MSE with one jitted
batched pass per batch, writes evaluation_reports/eval_results.txt.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path
from typing import Optional


def masked_recon_mse(model, params, x, lengths) -> float:
    """Masked reconstruction MSE (reference formula,
    evaluation/evaluate.py:89-99).

    The jitted executable is cached on the model (params are a traced
    argument), so per-batch eval loops pay one trace total instead of one
    per call — a fresh jit closure per batch costs a full retrace
    (~10 s each through a remote-compile relay)."""
    import jax
    import jax.numpy as jnp

    _mse = getattr(model, "_eval_mse_jit", None)
    if _mse is None:
        from ..core.masking import length_mask
        from ..ops.precise import psoftmax

        @jax.jit
        def _mse(params, x, lengths):
            valid_to = jnp.max(lengths)
            logits = model.encode(params, x, valid_to=valid_to)
            q = psoftmax(logits, axis=1)
            mu, _ = model.decode(params, q, valid_to=valid_to)
            mask = length_mask(lengths, x.shape[2]).astype(x.dtype)
            recon = ((mu - x) ** 2) * mask[:, None, :]
            denom = jnp.maximum(mask.sum() * x.shape[1], 1.0)
            return recon.sum() / denom

        model._eval_mse_jit = _mse

    return float(_mse(params, jnp.asarray(x), jnp.asarray(lengths)))


def evaluate(config: str, checkpoint: str, data=None,
             batch_size: int = 32,
             output: str = "evaluation_reports/eval_results.txt",
             log_fn=print) -> float:
    import jax

    from ..core.config import load_config
    from ..data.dataset import RandomChunkDataset, batch_iterator
    from ..models.vae_hmm import VAEHMM

    cfg = load_config(config)
    model = VAEHMM(cfg.model)

    if checkpoint.endswith(".npz"):
        from ..data.checkpoint import load_params_npz

        params = load_params_npz(checkpoint)
    elif checkpoint.endswith((".pt", ".pth")):
        from ..utils.torch_interop import (load_torch_file,
                                           vae_hmm_params_from_state_dict)

        params = vae_hmm_params_from_state_dict(load_torch_file(checkpoint))
    else:
        from ..data.checkpoint import load_checkpoint
        from ..train.trainer import TrainState, make_optimizer

        tx = make_optimizer(1e-3)
        p0 = model.init(jax.random.PRNGKey(0))
        import jax.numpy as jnp

        template = TrainState(p0, tx.init(p0), jnp.zeros((), jnp.int32))
        params = load_checkpoint(checkpoint, template).params

    if data is not None:
        x_seq, u_seq = data
        ds = RandomChunkDataset(x_seq, u_seq, min_len=20,
                                max_len=cfg.data.max_len,
                                samples_per_epoch=batch_size * 4, seed=0)
        total, batches = 0.0, 0
        for x, u, lengths in batch_iterator(ds, batch_size):
            total += masked_recon_mse(model, params, x, lengths)
            batches += 1
        mean_mse = total / batches if batches else float("nan")
    else:
        mean_mse = float("nan")

    Path(os.path.dirname(output) or ".").mkdir(parents=True, exist_ok=True)
    with open(output, "w") as f:
        f.write(f"Mean Recon MSE: {mean_mse}\n")
    if log_fn:
        log_fn(f"Evaluation finished. Results saved to {output}")
    return mean_mse


def main(argv: Optional[list] = None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/config.yaml")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--data", nargs="*", default=None,
                        help="x_sequences u_sequences paths")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--output",
                        default="evaluation_reports/eval_results.txt")
    args = parser.parse_args(argv)

    data = None
    if args.data and len(args.data) >= 2:
        from ..train.pipeline import load_sequences

        data = load_sequences(args.data[0], args.data[1])
    evaluate(args.config, args.checkpoint, data, args.batch_size,
             args.output)


if __name__ == "__main__":
    main()
