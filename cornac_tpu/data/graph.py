"""Graph modality: adjacency triplets aligned to dense entity indices.

Parity with reference ``cornac/data/graph.py:23-273``, with the kNN-graph
construction (``from_feature``) done as one blocked matrix product instead of
a per-row Python loop (reference ``graph.py:197-230``) — the same change that
makes it a single large matmul on TPU.
"""

import numpy as np
import scipy.sparse as sp

from .modality import FeatureModality


class GraphModality(FeatureModality):
    """User/user or item/item relations as sparse triplets
    ``(raw_id_i, raw_id_j, value)``."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.raw_data = kwargs.get("data", None)
        self.__matrix = None
        self.__matrix_size = None

    @property
    def matrix(self):
        """Adjacency matrix in CSR format over dense indices."""
        if self.__matrix is None:
            assert self.__matrix_size is not None
            self.__matrix = sp.csr_matrix(
                (self.val, (self.map_rid, self.map_cid)),
                shape=(self.__matrix_size, self.__matrix_size),
            )
        return self.__matrix

    def _build_triplet(self, id_map):
        map_rid, map_cid, val = [], [], []
        for i, j, v in self.raw_data:
            if (i not in id_map) or (j not in id_map):
                continue
            map_rid.append(id_map[i])
            map_cid.append(id_map[j])
            val.append(v)
        self.map_rid = np.asarray(map_rid, dtype="int")
        self.map_cid = np.asarray(map_cid, dtype="int")
        self.val = np.asarray(val, dtype="float")

    def build(self, id_map=None, **kwargs):
        super().build(id_map=id_map)
        self.__matrix = None
        if id_map is not None:
            self.__matrix_size = int(max(id_map.values()) + 1)
            self._build_triplet(id_map)
        return self

    def get_train_triplet(self, train_row_ids, train_col_ids):
        """Subset of relations whose endpoints are both in the given
        (training) index sets, as (rows, cols, vals)."""
        train_row_ids = np.asarray(list(train_row_ids))
        train_col_ids = np.asarray(list(train_col_ids))
        mask = np.isin(self.map_rid, train_row_ids) & np.isin(
            self.map_cid, train_col_ids
        )
        return self.map_rid[mask], self.map_cid[mask], self.val[mask]

    def get_node_degree(self, in_ids=None, out_ids=None):
        """Dict: node index -> [in_degree, out_degree] over the subgraph
        induced by (in_ids, out_ids)."""
        if in_ids is None:
            in_ids = self.map_cid
        if out_ids is None:
            out_ids = self.map_rid
        in_ids = np.asarray(list(in_ids))
        out_ids = np.asarray(list(out_ids))
        mask = np.isin(self.map_rid, out_ids) & np.isin(self.map_cid, in_ids)
        degree = {}
        for i, j in zip(self.map_rid[mask], self.map_cid[mask]):
            degree[i] = degree.get(i, np.asarray([0, 0])) + np.asarray([0, 1])
            degree[j] = degree.get(j, np.asarray([0, 0])) + np.asarray([1, 0])
        return degree

    def batch(self, batch_ids):
        """Adjacency rows for a batch of node indices."""
        return self.matrix[batch_ids]

    @staticmethod
    def _build_knn(features, k=5, similarity="cosine", verbose=True, block_size=1024):
        """k nearest neighbors per row via blocked X @ X.T (flops land on the
        MXU when run on device; here computed with BLAS on host)."""
        if similarity != "cosine":
            raise ValueError("Only cosine similarity is supported")
        feats = np.asarray(features, dtype=np.float32)
        norms = np.linalg.norm(feats, axis=1, keepdims=True)
        feats = feats / (norms + 1e-20)
        n = len(feats)
        neighbors = np.zeros((n, k), dtype=np.int64)
        for start in range(0, n, block_size):
            stop = min(start + block_size, n)
            sim = feats[start:stop] @ feats.T  # (block, n)
            rows = np.arange(start, stop)
            sim[np.arange(stop - start), rows] = -np.inf  # exclude self
            neighbors[start:stop] = np.argpartition(sim, -k, axis=1)[:, -k:]
        return neighbors

    @staticmethod
    def _to_triplet(mat, ids=None):
        tuples = set()
        n, k = mat.shape
        if ids is None:
            ids = range(n)
        for row in range(n):
            for col in range(k):
                tuples.add((ids[row], ids[int(mat[row, col])], 1.0))
        return tuples

    @staticmethod
    def _to_symmetric(triplets):
        triplets.update([(j, i, v) for (i, j, v) in triplets])
        return triplets

    @classmethod
    def from_feature(
        cls, features, k=5, ids=None, similarity="cosine", symmetric=False, verbose=True
    ):
        """Build a kNN graph from feature vectors."""
        knn = cls._build_knn(features, k, similarity, verbose=verbose)
        triplets = cls._to_triplet(knn, ids=ids)
        if symmetric:
            triplets = cls._to_symmetric(triplets)
        return cls(data=triplets)
