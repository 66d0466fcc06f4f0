"""Minimal neural-net building blocks as pure functions over pytrees.

The neural model family (VAECF, NCF, RecVAE, ...) shares these instead of
each model bringing its own framework (the reference mixes torch and TF2
per model — SURVEY §2.3). Initialization follows torch's ``nn.Linear``
default (U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for both W and b) so models
land in the same regime as their reference counterparts.
"""

import jax
import jax.numpy as jnp
import numpy as np

ACTIVATIONS = {
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "elu": jax.nn.elu,
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "leaky_relu": jax.nn.leaky_relu,
    "leaky": jax.nn.leaky_relu,
    "gelu": jax.nn.gelu,
    "softplus": jax.nn.softplus,
    "none": lambda x: x,
}


def init_dense(rng, fan_in, fan_out):
    """One linear layer's params, torch-default initialization."""
    bound = 1.0 / np.sqrt(fan_in)
    return {
        "w": jnp.asarray(
            rng.uniform(-bound, bound, size=(fan_in, fan_out)).astype(np.float32)
        ),
        "b": jnp.asarray(
            rng.uniform(-bound, bound, size=(fan_out,)).astype(np.float32)
        ),
    }


def dense(params, x):
    return x @ params["w"] + params["b"]


def init_mlp(rng, sizes):
    """Stack of linear layers: sizes = [in, h1, h2, ...]."""
    return [init_dense(rng, sizes[i], sizes[i + 1]) for i in range(len(sizes) - 1)]


# ---------------------------------------------------------------------- #
# transformer building blocks (shared by SASRec / BERT4Rec /
# TransformerRec / TIGER — the reference carries a separate torch module
# per model, e.g. sasrec/sasrec.py vs bert4rec's transformer)
# ---------------------------------------------------------------------- #
def layer_norm(x, g, b, eps=1e-8):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def make_drop(dropout, drop_key):
    """Inverted-dropout closure: ``drop(x, i)`` folds ``i`` into the key so
    each call site draws an independent mask; identity when rate is 0 or no
    key is given (inference)."""

    def drop(x, i):
        if dropout <= 0.0 or drop_key is None:
            return x
        keep = 1.0 - dropout
        k = jax.random.fold_in(drop_key, i)
        return x * jax.random.bernoulli(k, keep, x.shape) / keep

    return drop


def init_transformer_block(xav, d, ffn_mult=1):
    """Pre-LN transformer block params. ``xav`` is the caller's
    xavier-init closure so the rng consumption order stays owned by the
    model (frozen quality goldens pin it)."""
    return {
        "Wq": xav((d, d)),
        "Wk": xav((d, d)),
        "Wv": xav((d, d)),
        "Wo": xav((d, d)),
        "ln1_g": jnp.ones(d, jnp.float32),
        "ln1_b": jnp.zeros(d, jnp.float32),
        "ff1": xav((d, ffn_mult * d)),
        "ff1_b": jnp.zeros(ffn_mult * d, jnp.float32),
        "ff2": xav((ffn_mult * d, d)),
        "ff2_b": jnp.zeros(d, jnp.float32),
        "ln2_g": jnp.ones(d, jnp.float32),
        "ln2_b": jnp.zeros(d, jnp.float32),
    }


def block_attention(blk, q_in, kv_in, attn_mask, n_heads, drop, di):
    """One multi-head attention sub-layer: queries from ``q_in``, keys/
    values from ``kv_in`` (two-stream and SASRec's LN-on-queries-only both
    fall out of this asymmetry). ``attn_mask``: (B, Lq, Lk) bool."""
    B, L, d = kv_in.shape
    head_dim = d // n_heads
    Q = (q_in @ blk["Wq"]).reshape(B, -1, n_heads, head_dim)
    K = (kv_in @ blk["Wk"]).reshape(B, L, n_heads, head_dim)
    V = (kv_in @ blk["Wv"]).reshape(B, L, n_heads, head_dim)
    logits = jnp.einsum("blhd,bmhd->bhlm", Q, K) / np.sqrt(head_dim)
    logits = jnp.where(attn_mask[:, None, :, :], logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum("bhlm,bmhd->blhd", attn, V).reshape(B, -1, d)
    return drop(ctx @ blk["Wo"], di)


def block_ffn(blk, h, drop, di, act=jax.nn.gelu):
    """Pre-LN feed-forward sub-layer."""
    f = layer_norm(h, blk["ln2_g"], blk["ln2_b"])
    f = act(f @ blk["ff1"] + blk["ff1_b"])
    return drop(f @ blk["ff2"] + blk["ff2_b"], di)


def mlp(params, x, act, final_act=None):
    """Apply the stack; ``act`` between layers, ``final_act`` after the last
    (None = linear head)."""
    n = len(params)
    for i, layer in enumerate(params):
        x = dense(layer, x)
        if i < n - 1:
            x = act(x)
        elif final_act is not None:
            x = final_act(x)
    return x
