"""PCRL — Probabilistic Collaborative Representation Learning
(Salah & Lauw, UAI 2018).

Capability parity with reference ``cornac/models/pcrl/recom_pcrl.py:21`` +
``pcrl/pcrl.py:22-416`` (TensorFlow-1 implementation): Poisson
factorization on the CF matrix alternating with a neural Gamma inference
network over item auxiliary context (``train_set.item_graph``), trained by
rejection-sampling variational inference (Marsaglia–Tsang transform +
shape augmentation + score-function correction terms).

TPU redesign: ``jax.random.gamma`` carries **implicit reparameterization
gradients** natively, so the entire RSVI apparatus of the reference
(``G``/``G_inv``/``log_r`` correction terms, shape augmentation ``B``)
collapses to a single differentiable sampler — the ELBO is just Poisson
reconstruction of the context plus the analytic Gamma–Gamma KL against the
PF-side prior (shape ``aa+Zik``, rate ``bb+Tk``).  The PF sweep itself is
edge-based gather/normalize/scatter-add (same pattern as ``hpf.py``), and
each epoch (neural batches + PF sweep) is one compiled program.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..exception import ScoreException
from ..utils import get_rng
from .recommender import ANNMixin, MEASURE_DOT, Recommender

EPS = 1e-10
AA = 0.3  # Gamma prior shape hyper (reference pcrl.py:51-52)
BB = 0.3


def _glorot(rng, shape):
    std = 1.0 / np.sqrt(shape[0] / 2.0)
    return jnp.asarray(rng.normal(0.0, std, size=shape).astype(np.float32))


def _init_nets(rng, c_dim, z_dims, k):
    L = len(z_dims)
    inf = [_glorot(rng, (c_dim, z_dims[L - 1]))]
    for l in range(L - 2, -1, -1):
        inf.append(_glorot(rng, (z_dims[l + 1], z_dims[l])))
    inf.append(_glorot(rng, (z_dims[0], k)))  # -> beta head
    inf.append(_glorot(rng, (z_dims[0], k)))  # -> alpha head
    gen = [_glorot(rng, (k, z_dims[0]))]
    for l in range(1, L):
        gen.append(_glorot(rng, (z_dims[l - 1], z_dims[l])))
    gen.append(_glorot(rng, (z_dims[L - 1], c_dim)))
    return {"inf": inf, "gen": gen}


def _inference(params, C):
    h = C
    for W in params["inf"][:-2]:
        h = jax.nn.relu(h @ W)
    beta = jax.nn.softplus(h @ params["inf"][-2]) + 0.3
    alpha = jax.nn.softplus(h @ params["inf"][-1]) + 0.3
    return alpha, beta


def _generate(params, z, key, w_determinist):
    h = z
    for l, W in enumerate(params["gen"]):
        if not w_determinist:
            W = W + 0.01 * jax.random.normal(jax.random.fold_in(key, l), W.shape)
        h = h @ W
        if l < len(params["gen"]) - 1:
            h = jax.nn.relu(h)
    return jax.nn.sigmoid(h)


def _elbo_loss(params, C, Zik, Tk, key, w_determinist):
    alpha, beta = _inference(params, C)
    # implicitly-reparameterized Gamma sample (replaces reference RSVI)
    z = jax.random.gamma(key, alpha) / beta
    X_g = _generate(params, z, jax.random.fold_in(key, 2**31), w_determinist)
    # Poisson reconstruction of the context rows (reference loss1)
    ll = jnp.sum(C * jnp.log(EPS + X_g) - X_g, axis=1)
    # analytic Gamma-Gamma KL vs prior Gamma(AA + Zik, BB + Tk)
    # (reference pcrl.py:324-331, sign folded)
    kl = (
        (alpha - AA - Zik) * jax.scipy.special.digamma(alpha)
        - jax.scipy.special.gammaln(alpha)
        + (AA + Zik) * jnp.log(beta)
        + alpha * (Tk + BB - beta) / beta
    )
    kl = -jnp.sum(kl, axis=1)
    loss = -jnp.mean(ll + kl)
    if not w_determinist:
        kl_w = sum(
            jnp.sum(-0.5 * jnp.sum(W**2, axis=1)) for W in params["gen"]
        )
        loss = loss + kl_w / C.shape[0]
    return loss


@partial(jax.jit, donate_argnums=(0, 1))
def _pf_sweep(G_s, G_r, L_s, L_r, rid, cid, val):
    """One Poisson-factorization coordinate sweep (reference pf_)."""
    eps = EPS
    Lt = jnp.exp(
        jax.scipy.special.digamma(G_s) - jnp.log(jnp.maximum(G_r, eps))
    )
    Lb = jnp.exp(
        jax.scipy.special.digamma(L_s) - jnp.log(jnp.maximum(L_r, eps))
    )
    lt_e, lb_e = Lt[rid], Lb[cid]
    ratio = val / (jnp.sum(lt_e * lb_e, axis=1) + eps)
    # user-side sufficient stats
    G_s_new = AA + Lt * (
        jnp.zeros_like(G_s).at[rid].add(ratio[:, None] * lb_e)
    )
    G_r_new = jnp.sum(L_s / jnp.maximum(L_r, eps), axis=0)[None, :] + AA
    G_r_new = jnp.broadcast_to(G_r_new, G_s.shape)
    # item-side sufficient stats Zik and user mass Tk
    Zik = Lb * (jnp.zeros_like(L_s).at[cid].add(ratio[:, None] * lt_e))
    Tk = jnp.sum(G_s_new / jnp.maximum(G_r_new, eps), axis=0)
    return G_s_new, G_r_new, Zik, Tk


class PCRL(Recommender, ANNMixin):
    """Poisson CF + neural Gamma representation of item context."""

    def __init__(
        self,
        k=100,
        z_dims=None,
        max_iter=300,
        batch_size=300,
        learning_rate=0.001,
        name="PCRL",
        trainable=True,
        verbose=False,
        w_determinist=True,
        init_params=None,
        seed=None,
        mesh=None,
    ):
        Recommender.__init__(self, name=name, trainable=trainable, verbose=verbose)
        self.k = k
        self.z_dims = [300] if z_dims is None else list(z_dims)
        self.max_iter = max_iter
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.w_determinist = w_determinist
        self.seed = seed
        self.mesh = mesh

        self.init_params = {} if init_params is None else init_params
        self.Theta = self.init_params.get("Theta", None)
        self.Beta = self.init_params.get("Beta", None)
        self.Gs = self.init_params.get("G_s", None)
        self.Gr = self.init_params.get("G_r", None)
        self.Ls = self.init_params.get("L_s", None)
        self.Lr = self.init_params.get("L_r", None)

    def fit(self, train_set, val_set=None):
        Recommender.fit(self, train_set, val_set)
        if not self.trainable:
            return self
        if train_set.item_graph is None:
            raise ValueError("PCRL requires an item_graph modality")

        rng = get_rng(self.seed)
        n, d, k = self.num_users, self.num_items, self.k
        aux = train_set.item_graph.matrix[:d, :d]
        C_np = np.asarray(aux.todense(), dtype=np.float32)
        c_dim = C_np.shape[1]

        rid, cid, val = train_set.uir_tuple
        rid = jnp.asarray(rid, jnp.int32)
        cid = jnp.asarray(cid, jnp.int32)
        val = jnp.asarray(val, jnp.float32)

        def tbl(existing, rows):
            if existing is not None:
                return jnp.asarray(np.asarray(existing), jnp.float32)
            return jnp.asarray(
                rng.gamma(50, scale=0.3 / 50, size=(rows, k)).astype(np.float32)
            )

        G_s, G_r = tbl(self.Gs, n), tbl(self.Gr, n)
        L_s, L_r = tbl(self.Ls, d), tbl(self.Lr, d)

        params = _init_nets(rng, c_dim, self.z_dims, k)
        optimizer = optax.rmsprop(self.learning_rate)
        opt_state = optimizer.init(params)

        bsz = min(self.batch_size, d)
        if self.mesh is not None:
            bsz = max(self.mesh.size, bsz - bsz % self.mesh.size)
        n_pad = (-d) % bsz
        C_pad = np.concatenate(
            [C_np, np.zeros((n_pad, c_dim), np.float32)]
        ) if n_pad else C_np
        n_batches = C_pad.shape[0] // bsz
        C_d = jnp.asarray(C_pad)
        w_det = self.w_determinist

        # mesh: the PF sweep's rating edges shard over the data axis
        # (val == 0 padding edges have ratio 0 -> exactly inert, same as
        # HPF's CAVI), the neural phase runs data-parallel over the item
        # batches; Gamma tables + nets replicate
        batch_shard2 = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import replicate_all, shard_batch

            pad_e = (-len(train_set.uir_tuple[0])) % self.mesh.size
            if pad_e:
                z = lambda a: jnp.concatenate([a, jnp.zeros(pad_e, a.dtype)])
                rid, cid, val = z(rid), z(cid), z(val)
            rid, cid, val = (shard_batch(self.mesh, e) for e in (rid, cid, val))
            batch_shard2 = NamedSharding(
                self.mesh, P(tuple(self.mesh.axis_names), None)
            )
            params, opt_state, G_s, G_r, L_s, L_r, C_d = replicate_all(
                self.mesh, params, opt_state, G_s, G_r, L_s, L_r, C_d
            )

        @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def epoch(params, opt_state, G_s, G_r, L_s, L_r, key):
            # PF sweep gives prior stats for the neural ELBO
            G_s, G_r, Zik, Tk = _pf_sweep(G_s, G_r, L_s, L_r, rid, cid, val)
            Zik_pad = jnp.concatenate(
                [Zik, jnp.zeros((n_pad, k), jnp.float32)]
            ) if n_pad else Zik

            def step(b, carry):
                params, opt_state, loss_sum = carry
                Cb = jax.lax.dynamic_slice(C_d, (b * bsz, 0), (bsz, c_dim))
                Zb = jax.lax.dynamic_slice(Zik_pad, (b * bsz, 0), (bsz, k))
                if batch_shard2 is not None:
                    Cb = jax.lax.with_sharding_constraint(Cb, batch_shard2)
                    Zb = jax.lax.with_sharding_constraint(Zb, batch_shard2)
                loss, grads = jax.value_and_grad(_elbo_loss)(
                    params, Cb, Zb, Tk[None, :], jax.random.fold_in(key, b),
                    w_det,
                )
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, loss_sum + loss

            params, opt_state, loss_sum = jax.lax.fori_loop(
                0, n_batches, step, (params, opt_state, jnp.float32(0.0))
            )
            # refresh item variational parameters from the inference net
            alpha, beta = _inference(params, C_d)
            return params, opt_state, alpha[:d], beta[:d], G_s, G_r, loss_sum

        key = jax.random.PRNGKey(rng.randint(2**31))
        for it in range(self.max_iter):
            params, opt_state, L_s, L_r, G_s, G_r, loss = epoch(
                params, opt_state, G_s, G_r, L_s, L_r, jax.random.fold_in(key, it)
            )
            if self.verbose:
                print("epoch %d, Train Loss: %f" % (it, float(loss)))
        # final user update against the learned item representation
        G_s, G_r, _, _ = _pf_sweep(G_s, G_r, L_s, L_r, rid, cid, val)

        self.params = params
        self.Gs, self.Gr = np.asarray(G_s), np.asarray(G_r)
        self.Ls, self.Lr = np.asarray(L_s), np.asarray(L_r)
        self.Theta = self.Gs / np.maximum(self.Gr, EPS)
        self.Beta = self.Ls / np.maximum(self.Lr, EPS)
        return self

    def score(self, user_idx, item_idx=None):
        if self.is_unknown_user(user_idx):
            raise ScoreException("Can't make score prediction for user %d" % user_idx)
        if item_idx is None:
            return self.Beta @ self.Theta[user_idx]
        if self.is_unknown_item(item_idx):
            raise ScoreException("Can't make score prediction for item %d" % item_idx)
        return float(self.Theta[user_idx] @ self.Beta[item_idx])

    def score_batch(self, user_indices):
        users = np.asarray(user_indices)
        known = (users >= 0) & (users < self.num_users)
        scores = (self.Theta[np.where(known, users, 0)] @ self.Beta.T).astype(
            np.float64
        )
        scores[~known] = self.default_score()
        total = self.total_items
        if scores.shape[1] < total:
            out = np.broadcast_to(
                scores.min(axis=1, keepdims=True), (scores.shape[0], total)
            ).copy()
            out[:, : scores.shape[1]] = scores
            return out
        return scores

    def get_vector_measure(self):
        return MEASURE_DOT

    def get_user_vectors(self):
        return self.Theta

    def get_item_vectors(self):
        return self.Beta
