"""Medusa-2 tree verification: top-b candidates per head, one tree-
attention verify (VERDICT r3 #4).

Medusa-1's greedy ceiling on this corpus is 1.57 tokens/verify — the
probability that every head's TOP-1 matches the base argmax chain —
against a measured 1.53x verify-step premium: a tie (DESIGN.md §3.9).
Tree verification raises the ceiling: each head contributes its top-b
candidates, arranged as a static sparse tree of candidate paths, and
one tree-attention forward (models.gpt.decode_tree — sibling nodes
share a position, each node attends to the cache prefix + its ancestor
chain) scores every path at once. Greedy acceptance walks the deepest
path whose every node matches the base argmax at its parent — output
is bit-identical to plain greedy decoding by construction (tested).

Greedy-only by design: greedy batch-1 is the reference's actual serving
mode (api_cache.py:204 temperature=1.0 sampling aside, the paper's
latency tables are greedy) and the mode medusa-1 ties on; sampled
traffic already has the 1.38-1.52x medusa-1 win.

The default tree spends its 12 candidate nodes front-loaded (4-2-1
branching early, where acceptance probability is highest), the shape
arXiv:2401.10774 §3.3 calibrates for LLMs.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..models.gpt import (GPTConfig, decode_tree, init_kv_cache,
                          prefill)
from .medusa import _stack_heads

# (parent_node, head_index, candidate_rank); node 0 is the root (the
# last verified token), spec entries are nodes 1..len(spec).
DEFAULT_TREE: tuple = (
    (0, 0, 0), (0, 0, 1), (0, 0, 2), (0, 0, 3),   # depth 1: top-4
    (1, 1, 0), (1, 1, 1), (2, 1, 0),              # depth 2
    (5, 2, 0), (5, 2, 1), (6, 2, 0),              # depth 3
    (8, 3, 0), (9, 3, 0),                         # depth 4
)


def tree_tables(spec: tuple = DEFAULT_TREE):
    """Static numpy tables for a tree spec: parents, heads, ranks,
    depths, the [N, N] ancestor-or-self matrix, and the [N, gamma]
    path table (chain[i, d] = node id at depth d+1 on root->i)."""
    N = len(spec) + 1
    parent = np.zeros(N, np.int32)
    head = np.zeros(N, np.int32)
    rank = np.zeros(N, np.int32)
    depth = np.zeros(N, np.int32)
    for i, (p, h, r) in enumerate(spec, start=1):
        assert p < i, "parents must precede children"
        parent[i], head[i], rank[i] = p, h, r
        depth[i] = depth[p] + 1
    anc = np.zeros((N, N), bool)
    for i in range(N):
        j = i
        while True:
            anc[i, j] = True
            if j == 0:
                break
            j = int(parent[j])
    gamma = int(depth.max())
    chain = np.zeros((N, gamma), np.int32)
    for i in range(N):
        j = i
        while j != 0:
            chain[i, depth[j] - 1] = j
            j = int(parent[j])
    b_max = int(rank.max()) + 1
    n_heads = int(head[1:].max()) + 1 if N > 1 else 0
    return {"parent": parent, "head": head, "rank": rank,
            "depth": depth, "anc": anc, "chain": chain, "N": N,
            "gamma": gamma, "b_max": b_max, "n_heads": n_heads}


def _top_b(logits: jax.Array, b: int) -> jax.Array:
    """[g, V] -> [g, b] argmax ranks via b serial argmax+mask rounds
    (b is tiny; lax.top_k's sort costs ~76 us/step on this runtime)."""
    out = []
    lg = logits
    for _ in range(b):
        idx = jnp.argmax(lg, -1)
        out.append(idx.astype(jnp.int32))
        lg = lg - jax.nn.one_hot(idx, lg.shape[-1]) * jnp.inf
    return jnp.stack(out, axis=1)


@partial(jax.jit, static_argnames=("cfg", "max_len", "tree"))
def generate_medusa_tree(params: dict, heads: dict, prompt: jax.Array,
                         prompt_len, cfg: GPTConfig, max_len: int,
                         tree: tuple = DEFAULT_TREE,
                         eos_id: int = -1, pad_id: int = 0):
    """Greedy tree-verified decode: prompt [1, P] ->
    (tokens [1, max_len], n_tokens, n_verify_steps). Output is
    bit-identical to plain greedy decoding (the acceptance walks the
    base argmax chain); tokens/verify = acceptance is the win."""
    assert cfg.causal and not cfg.pos_broadcast_bug
    tb = tree_tables(tree)
    N, gamma = tb["N"], tb["gamma"]
    assert len(heads["blocks"]) >= tb["n_heads"]
    heads = {"blocks": heads["blocks"][:tb["n_heads"]]}
    B, P = prompt.shape
    assert B == 1
    assert cfg.n_pos >= max_len + gamma
    slack = max_len + N + 1

    hw, hb = _stack_heads(heads)
    parent_j = jnp.asarray(tb["parent"])
    head_j = jnp.asarray(tb["head"])
    rank_j = jnp.asarray(tb["rank"])
    depth_j = jnp.asarray(tb["depth"])
    anc_j = jnp.asarray(tb["anc"])
    chain_j = jnp.asarray(tb["chain"])

    # ---- init: prefill + greedy first token (rng-free) ---------------
    cache = init_kv_cache(cfg, 1, slack)
    logits0, cache = prefill(params, prompt, cfg, cache,
                             prompt_len=prompt_len)
    buf = jnp.full((1, slack), pad_id, jnp.int32)
    buf = jax.lax.dynamic_update_slice(
        buf, jnp.where(jnp.arange(P)[None] < prompt_len, prompt,
                       pad_id).astype(jnp.int32), (0, 0))
    first = jnp.argmax(logits0[0, prompt_len - 1]).astype(jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, first[None, None],
                                       (0, prompt_len))
    pos0 = prompt_len + 1
    done0 = first == eos_id
    h0 = jnp.zeros((cfg.d_model,), cfg.jnp_dtype)

    def body(state):
        buf, pos, last, h_last, done, cache, n_steps = state
        L = pos - 1

        # ---- proposals: top-b per head, tree token per node ----------
        hk = h_last[None] + jax.nn.silu(
            jnp.einsum("gde,e->gd", hw, h_last) + hb)
        head_lg = (hk.astype(jnp.float32) @ params["head"]["w"].T
                   + params["head"]["b"])                  # [g, V]
        cand = _top_b(head_lg, tb["b_max"])                # [g, b]
        tok = jnp.concatenate([
            last[None], cand[tb["head"][1:], tb["rank"][1:]]])  # [N]

        # ---- one tree-attention verify -------------------------------
        ct = {"k": cache["k"], "v": cache["v"],
              "length": jnp.asarray(L, jnp.int32)}
        logits_t, h_block, ct = decode_tree(params, tok[None], depth_j,
                                            anc_j, ct, cfg)
        t_pred = jnp.argmax(logits_t[0], -1).astype(jnp.int32)   # [N]

        # ---- greedy path acceptance ----------------------------------
        matched = tok == t_pred[parent_j]                  # [N]
        ok_list = [jnp.asarray(True)]
        for i in range(1, N):
            ok_list.append(ok_list[tb["parent"][i]] & matched[i])
        ok = jnp.stack(ok_list)
        score = jnp.where(ok, depth_j, -1)
        n = jnp.max(score)                                 # accepted depth
        best = jnp.argmax(score)                           # unique per depth
        onehot_best = jax.nn.one_hot(best, N)
        bonus = jnp.sum(t_pred * onehot_best.astype(jnp.int32))
        chain_b = jnp.sum(onehot_best[:, None].astype(jnp.int32)
                          * chain_j, axis=0)               # [gamma]
        path_toks = jnp.sum(
            jax.nn.one_hot(chain_b, N, dtype=jnp.int32) * tok[None],
            axis=-1)                                       # [gamma]

        # ---- emitted window: path tokens, bonus, EOS clamp -----------
        idx = jnp.arange(gamma + 1)
        window = jnp.where(idx < n,
                           jnp.concatenate([path_toks, path_toks[-1:]]),
                           jnp.where(idx == n, bonus, pad_id)
                           ).astype(jnp.int32)
        is_eos = window == eos_id
        big = gamma + 2
        e = jnp.min(jnp.where(is_eos & (idx <= n), idx, big))
        limit = jnp.minimum(n + 1, e + 1)
        window = jnp.where(idx < limit, window, pad_id).astype(jnp.int32)
        buf = jax.lax.dynamic_update_slice(buf, window[None], (0, pos))
        new_pos = pos + limit
        new_last = window[limit - 1]
        done = e <= n
        # hidden of the node whose base head predicted new_last: the
        # accepted node when the bonus was emitted, else the path node
        # at depth limit-1 (EOS clamp) — exactly medusa-1's
        # h_block[limit-1] rule, mapped through the tree: node id =
        # chain[best][limit-2] for limit>1, root for limit==1... the
        # emitted token at index limit-1 sits at tree node
        # (limit-1 == n+1 impossible; limit-1 <= n): bonus case
        # limit-1 == n -> node best; clamped case -> chain[best][limit-1]
        pick = jnp.where(limit - 1 >= n, best,
                         jnp.sum(jax.nn.one_hot(limit - 1, gamma,
                                                dtype=jnp.int32)
                                 * chain_b))
        h_new = jnp.einsum("n,nd->d",
                           jax.nn.one_hot(pick, N, dtype=h_block.dtype),
                           h_block[0])
        h_last = h_new

        # ---- commit the accepted path's K/V to contiguous slots ------
        keep = (jnp.arange(gamma) < n)[:, None]
        sel = jax.nn.one_hot(chain_b, N) * keep            # [gamma, N]
        ks, vs = list(ct["k"]), list(ct["v"])
        zero = jnp.asarray(0, jnp.int32)
        for li in range(cfg.n_layer):
            k_stage = jax.lax.dynamic_slice(
                ks[li], (zero, zero, L, zero),
                (1, cfg.kv_heads, N, cfg.head_dim))
            v_stage = jax.lax.dynamic_slice(
                vs[li], (zero, zero, L, zero),
                (1, cfg.kv_heads, N, cfg.head_dim))
            k_path = jnp.einsum("gn,bhnd->bhgd",
                                sel.astype(k_stage.dtype), k_stage)
            v_path = jnp.einsum("gn,bhnd->bhgd",
                                sel.astype(v_stage.dtype), v_stage)
            ks[li] = jax.lax.dynamic_update_slice(
                ks[li], k_path, (zero, zero, L + 1, zero))
            vs[li] = jax.lax.dynamic_update_slice(
                vs[li], v_path, (zero, zero, L + 1, zero))
        new_cache = {"k": tuple(ks), "v": tuple(vs),
                     "length": jnp.asarray(new_pos - 1, jnp.int32)}
        return (buf, new_pos, new_last, h_last, done, new_cache,
                n_steps + 1)

    def cond(state):
        buf, pos, last, h_last, done, cache, n_steps = state
        return jnp.logical_and(pos < max_len, ~done)

    state0 = (buf, jnp.asarray(pos0, jnp.int32), first, h0, done0,
              cache, jnp.asarray(0, jnp.int32))
    buf, pos, _, _, _, _, n_steps = jax.lax.while_loop(
        cond, body, state0)
    pos = jnp.minimum(pos, max_len)
    idx = jnp.arange(slack)[None]
    buf = jnp.where(idx < pos, buf, pad_id)
    return buf[:, :max_len], pos, n_steps
