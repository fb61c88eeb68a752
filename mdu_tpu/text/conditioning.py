"""Prompt -> cond-pytree conditioning (the reference's Condition helpers).

Owns what ref tile_utils/utils.py:102-148 delegates to A1111's
prompt_parser: emphasis-weighted CLIP embeddings (weights multiply token
embeddings, overall mean preserved), 75-token chunking with BREAK, prompt
*scheduling* (per-step cond banks gathered by traced step index), and
region cond construction (region prompt appended to the base prompts,
ref Prompt.append_prompt utils.py:112-114).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import CLIPTextModel
from .prompt import (extract_networks, has_alternation, parse_prompt_attention,
                     parse_prompt_schedule, prompt_at_step_with_alternation,
                     split_composable)
from .tokenizer import CLIPTokenizer, HashTokenizer

Cond = Dict[str, Any]
CondOrFn = Union[Cond, Callable]


class TextConditioner:
    def __init__(self, model: CLIPTextModel, params: Any,
                 tokenizer=None, chunk_size: int = 75):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer or HashTokenizer(model.cfg.vocab_size,
                                                    model.cfg.max_length)
        self.chunk = min(chunk_size, model.cfg.max_length - 2)
        # params as a jit argument, not a closure (CLAUDE.md: closed-over
        # weights become HLO constants and stall the remote TPU compiler)
        jitted = jax.jit(model.apply)
        self._embed = lambda ids: jitted(self.params, ids)

    # ------------------------------------------------------------- encoding

    def _weighted_ids(self, text: str) -> List[Tuple[List[int], List[float]]]:
        """-> per-chunk (ids, weights) including bos/eot/padding."""
        tok = self.tokenizer
        pieces: List[Tuple[int, float]] = []
        chunks: List[Tuple[List[int], List[float]]] = []

        def flush():
            ids = [p[0] for p in pieces]
            ws = [p[1] for p in pieces]
            full = [tok.bos] + ids + [tok.eot]
            full += [tok.pad_token] * (tok.max_length - len(full))
            wfull = [1.0] + ws + [1.0]
            wfull += [1.0] * (tok.max_length - len(wfull))
            chunks.append((full, wfull))
            pieces.clear()

        for frag, w in parse_prompt_attention(text):
            if frag == "BREAK":
                if pieces:
                    flush()
                continue
            for tid in tok.tokenize(frag):
                pieces.append((tid, w))
                if len(pieces) == self.chunk:
                    flush()
        # final chunk only if non-empty, or nothing was emitted at all — an
        # exact chunk-multiple prompt must not gain an empty trailing chunk
        # (A1111 emits the last chunk only when it has tokens)
        if pieces or not chunks:
            flush()
        return chunks

    def encode(self, texts: Sequence[str]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (crossattn [B, n_chunks*77, D], pooled [B, D']).

        All prompts in the batch are padded to the same chunk count.
        """
        per_text = [self._weighted_ids(t) for t in texts]
        n_chunks = max(len(c) for c in per_text)
        tok = self.tokenizer
        empty_ids = [tok.bos, tok.eot] + [tok.pad_token] * (tok.max_length - 2)
        empty_ws = [1.0] * tok.max_length

        outs, pooleds = [], []
        for chunks in per_text:
            chunks = chunks + [(empty_ids, empty_ws)] * (n_chunks - len(chunks))
            zs = []
            pooled = None
            for ids, ws in chunks:
                z, p = self._embed(jnp.asarray([ids], jnp.int32))
                w = jnp.asarray(ws, jnp.float32)[None, :, None]
                mean0 = jnp.mean(z)
                z = z * w
                new_mean = jnp.mean(z)
                # A1111 mean preservation, guarded against ~0 means
                ratio = jnp.where(jnp.abs(new_mean) > 1e-7, mean0 / new_mean, 1.0)
                z = z * ratio
                zs.append(z)
                if pooled is None:
                    pooled = p                     # first chunk's pooled state
            outs.append(jnp.concatenate(zs, axis=1))
            pooleds.append(pooled)
        return jnp.concatenate(outs, axis=0), jnp.concatenate(pooleds, axis=0)

    # ----------------------------------------------------------- cond trees

    def cond(self, prompt: str, steps: Optional[int] = None,
             extra: Optional[Cond] = None) -> CondOrFn:
        """Cond pytree; a scheduled bank when the prompt has [a:b:N] syntax;
        a composable dict when it has AND branches (weights applied in the
        guided denoiser as composable diffusion)."""
        extra = extra or {}
        prompt, networks = extract_networks(prompt)
        self.last_networks = networks      # (kind, name, weight) for the caller
        parts = split_composable(prompt)
        if len(parts) > 1:
            # each AND branch is encoded independently (and may itself be a
            # scheduled bank); the pipeline resolves branches per step.
            # Branches must produce the same chunk count (they are encoded
            # separately, so a 90-token branch next to a 10-token one fails
            # at trace time — pad with BREAK if needed).
            return {"__and__": [self.cond(p.text, steps, extra) for p in parts],
                    "__weights__": tuple(p.weight for p in parts)}
        if steps is not None and has_alternation(prompt):
            # alternating words [a|b]: one cond per step pattern, deduped
            per_step = [prompt_at_step_with_alternation(prompt, i, steps)
                        for i in range(steps)]
            uniq = list(dict.fromkeys(per_step))
            bank, pooled = self.encode(uniq)
            idx = jnp.asarray([uniq.index(p) for p in per_step], jnp.int32)
            return {"__bank__": {"crossattn": bank}, "__index__": idx, **extra}
        if steps is not None:
            sched = parse_prompt_schedule(prompt, steps)
            if len(sched) > 1:
                texts = [p for _, p in sched]
                bank, pooled = self.encode(texts)     # [S, L, D]
                idx = np.zeros(steps, np.int32)
                start = 0
                for v, (end, _) in enumerate(sched):
                    idx[start:end] = v
                    start = end
                # scheduled-cond bank pytree: the pipeline selects bank[idx[step]]
                # inside jit, so the whole cond stays a jit argument (cacheable)
                return {"__bank__": {"crossattn": bank},
                        "__index__": jnp.asarray(idx), **extra}
            # single-entry schedule (e.g. [a:b:N] with N >= steps): encode the
            # *resolved* text, not the raw bracketed prompt
            prompt = sched[0][1]
        z, pooled = self.encode([prompt])
        return {"crossattn": z, **extra}

    def pair(self, prompt: str, neg_prompt: str = "",
             steps: Optional[int] = None) -> Tuple[CondOrFn, CondOrFn]:
        return self.cond(prompt, steps), self.cond(neg_prompt, steps)

    def region_pair(self, base_prompt: str, region_prompt: str,
                    region_neg: str = "", base_neg: str = "",
                    steps: Optional[int] = None) -> Tuple[CondOrFn, CondOrFn]:
        """Region cond: base prompt + ', region prompt' appended
        (ref Condition.get_custom_cond, utils.py:121-127); region negatives
        appended to the base negative likewise."""
        p = f"{base_prompt}, {region_prompt}" if region_prompt else base_prompt
        n = f"{base_neg}, {region_neg}" if region_neg else base_neg
        return self.cond(p, steps), self.cond(n, steps)
