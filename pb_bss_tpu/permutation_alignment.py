"""Frequency permutation alignment, TPU-native.

Capability parity with the reference ``pb_bss/permutation_alignment.py``
(DHTVPermutationAlignment :133-355, GreedyPermutationAlignment :592-700,
OraclePermutationAlignment :703-786, score/assignment core :380-589) —
redesigned for XLA:

* the reference realigns one frequency bin at a time inside a Python
  loop (permutation_alignment.py:340-351). Within one iteration the
  centroid is fixed and the per-bin realignments are independent, so
  here **all bins of a segment are realigned at once**: one batched
  score-matrix matmul (MXU) + a batched greedy assignment (K argmax
  sweeps over a (W, K, K) score tensor, W = segment width).
* the greedy/optimal assignment (reference :469-589, per-bin
  ``np.ndindex`` loops) is vectorized over arbitrary leading dims; the
  optimal variant enumerates the K! permutations as one static gather.
* ``GreedyPermutationAlignment``'s recursive mapping chain
  (reference :690-699, sequential over F) is permutation composition,
  which is associative — it runs as ``lax.associative_scan`` in
  O(log F) depth.
* segment loops stay in Python (the alignment plan is static given the
  STFT size), each with static shapes; the fix-point early exit
  (reference :349-351) is a ``lax.while_loop``.
"""
from __future__ import annotations

import functools
import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    'DHTVPermutationAlignment',
    'OraclePermutationAlignment',
    'GreedyPermutationAlignment',
    'apply_mapping',
    'sample_random_mapping',
]


def interleave(*lists):
    """Interleave multiple lists (may have different lengths).

    >>> list(interleave([1, 2, 3, 4, 5], ['a', 'b', 'c', 'd', 'e', 'f', 'g']))
    [1, 'a', 2, 'b', 3, 'c', 4, 'd', 5, 'e', 'f', 'g']
    """
    iterators = [iter(l) for l in lists]
    while True:
        for idx in range(len(iterators)):
            try:
                if iterators[idx] is not None:
                    yield next(iterators[idx])
            except StopIteration:
                iterators[idx] = None
        if all(i is None for i in iterators):
            break


def sample_random_mapping(K, F, key=None):
    """Random (K, F) mapping, one permutation per frequency."""
    if key is None:
        key = jax.random.key(0)
    keys = jax.random.split(key, F)
    return jnp.stack(
        [jax.random.permutation(k, K) for k in keys], axis=1)


def apply_mapping(mask, mapping):
    """Apply a reverse mapping: ``aligned[k, f] = mask[mapping[k, f], f]``.

    Float masks are permuted by a one-hot contraction (TPU gathers
    lower to slow dynamic slices; the (K, F, K) permutation-matrix
    einsum stays on the VPU/MXU); integer/bool masks use the gather.

    Args:
        mask: (K, F, ...) permuted mask.
        mapping: (K, F) integer reverse mapping.
    """
    mask = jnp.asarray(mask)
    mapping = jnp.asarray(mapping)
    K, F = mapping.shape
    assert K < 20, (K, mapping.shape)
    assert mask.shape[:2] == mapping.shape, (mask.shape, mapping.shape)
    if jnp.issubdtype(mask.dtype, jnp.floating) \
            or jnp.issubdtype(mask.dtype, jnp.complexfloating):
        perm = (mapping[..., None] == jnp.arange(K)).astype(mask.dtype)
        return jnp.einsum('kfj,jf...->kf...', perm, mask)
    idx = mapping.reshape(mapping.shape + (1,) * (mask.ndim - 2))
    return jnp.take_along_axis(mask, idx, axis=0)


def _parameterized_vector_norm(a, axis=-1):
    """Unit norm; zero vectors stay zero (reference :358-377)."""
    a = jnp.asarray(a)
    norm = jnp.sqrt(jnp.sum(
        jnp.real(a * a.conj()), axis=axis, keepdims=True))
    tiny = jnp.finfo(norm.dtype).tiny
    return a / jnp.maximum(norm, tiny)


class _ScoreMatrix:
    """Score-matrix namespace (reference :380-443).

    Inputs: ``mask`` / ``reference_mask`` with shape (K, ..., T); output
    score matrix has shape (..., K, K) with ``score[..., a, b]`` = the
    similarity of ``mask[b]`` to ``reference_mask[a]``.
    """

    @classmethod
    def cos(cls, mask, reference_mask):
        return cls.multiply(
            _parameterized_vector_norm(mask, axis=-1),
            _parameterized_vector_norm(reference_mask, axis=-1),
        )

    @classmethod
    def multiply(cls, mask, reference_mask):
        return jnp.einsum(
            'K...T,k...T->...kK',
            jnp.asarray(mask).conj(),
            jnp.asarray(reference_mask),
            precision=jax.lax.Precision.HIGHEST,
        )

    @classmethod
    def euclidean(cls, mask, reference_mask):
        mask = jnp.asarray(mask)
        reference_mask = jnp.asarray(reference_mask)
        # score[..., a, b] = -||mask[b] - ref[a]||
        diff = mask[None, ...] - reference_mask[:, None, ...]
        dist = jnp.sqrt(jnp.sum(
            jnp.real(diff * diff.conj()), axis=-1))  # (a, b, ...)
        return -jnp.moveaxis(dist, (0, 1), (-2, -1))

    @classmethod
    def from_name(cls, similarity_metric):
        try:
            return getattr(cls, similarity_metric)
        except AttributeError as e:
            attrs = ', '.join(
                a for a in dir(cls)
                if not a.startswith('__') and a != 'from_name')
            raise AttributeError(
                str(e) + '\nSuggestions: ' + attrs) from e


def _greedy_mapping(score_matrix):
    """Vectorized greedy assignment (reference :524-555).

    Repeat K times: take the global argmax (i, j) of the score matrix,
    record ``mapping[i] = j``, eliminate row i and column j. Ties break
    like ``np.argmax`` (first flat index).

    Args:
        score_matrix: (..., K, K) real.
    Returns:
        (..., K) integer reverse mapping (trailing axis = K "rows").
    """
    score = jnp.asarray(score_matrix)
    K = score.shape[-1]
    batch = score.shape[:-2]
    score = score.astype(jnp.result_type(score.dtype, jnp.float32))
    neg_inf = -jnp.inf
    mapping = jnp.zeros(batch + (K,), jnp.int32)
    iota = jnp.arange(K)
    for _ in range(K):
        flat = score.reshape(batch + (K * K,))
        idx = jnp.argmax(flat, axis=-1)
        i = idx // K
        j = idx % K
        row_hit = iota == i[..., None]                      # (..., K)
        col_hit = iota == j[..., None]                      # (..., K)
        score = jnp.where(row_hit[..., :, None], neg_inf, score)
        score = jnp.where(col_hit[..., None, :], neg_inf, score)
        mapping = jnp.where(row_hit, j[..., None], mapping)
    return mapping


def _permutation_table(K, dtype=np.int32):
    return np.array(
        list(itertools.permutations(range(K))), dtype=dtype)  # (K!, K)


def _optimal_mapping(score_matrix):
    """Brute-force optimal assignment over the K! permutations
    (reference :557-585; equals ``scipy.optimize.linear_sum_assignment``).

    The permutations are a static table, so the search is one gather +
    reduction + argmax — no data-dependent control flow.
    """
    score = jnp.asarray(score_matrix)
    K = score.shape[-1]
    assert K <= 8, (K, 'K! search space too large; use greedy')
    perms = _permutation_table(K)                            # (P, K)
    # score[..., arange(K), perm] summed over K, for each perm
    gathered = score[..., jnp.arange(K)[None, :], perms]     # (..., P, K)
    totals = jnp.sum(gathered, axis=-1)                      # (..., P)
    best = jnp.argmax(totals, axis=-1)                       # (...,)
    return jnp.asarray(perms)[best]                          # (..., K)


def _mapping_from_score_matrix(score_matrix, algorithm='optimal'):
    """Reverse mapping from a (..., K, K) score matrix.

    Matches the reference semantics (permutation_alignment.py:469-589),
    including the leading-axis ordering of the result: (K, ...).

    >>> score_matrix = np.array([[11, 10, 0], [4, 5, 10], [6, 0, 5]])
    >>> np.asarray(_mapping_from_score_matrix(score_matrix, 'optimal')).tolist()
    [1, 2, 0]
    >>> np.asarray(_mapping_from_score_matrix(score_matrix, 'greedy')).tolist()
    [0, 2, 1]
    >>> np.asarray(_mapping_from_score_matrix(
    ...     [score_matrix, score_matrix], 'greedy')).tolist()
    [[0, 0], [2, 2], [1, 1]]
    """
    score_matrix = jnp.asarray(score_matrix)
    if not isinstance(score_matrix, jax.core.Tracer):
        if not np.all(np.isfinite(np.asarray(score_matrix))):
            raise ValueError('score matrix is infeasible')
    if algorithm == 'greedy':
        mapping = _greedy_mapping(score_matrix)
    elif algorithm == 'optimal':
        mapping = _optimal_mapping(score_matrix)
    else:
        raise ValueError(algorithm)
    # (..., K) -> (K, ...)
    return jnp.moveaxis(mapping, -1, 0)


class _PermutationAlignment:
    def calculate_mapping(self, mask, *args, **kwargs):
        raise NotImplementedError()

    def __call__(self, mask, *args, **kwargs):
        """Calculate the mapping and apply it to ``mask`` (K, F, T)."""
        mapping = self.calculate_mapping(mask, *args, **kwargs)
        return self.apply_mapping(mask, mapping)

    @staticmethod
    def apply_mapping(mask, mapping):
        return apply_mapping(mask, mapping)


class DHTVPermutationAlignment(_PermutationAlignment):
    """Multi-resolution frequency permutation alignment [TranVu2015BSS]
    (reference :133-355). Does not solve the global permutation problem.

    TPU realization: per segment, each iteration is (centroid reduction
    -> batched score matmul -> batched greedy assignment -> gather),
    all bins at once; iterations run in a ``lax.while_loop`` with the
    reference's nothing-changed early exit; the segment sequence is
    unrolled (static alignment plan).
    """

    def __init__(
            self, *,
            stft_size,
            segment_start, segment_width, segment_shift,
            main_iterations, sub_iterations,
            similarity_metric='cos',
            algorithm='greedy',
    ):
        self.stft_size = stft_size
        self.segment_start = segment_start
        self.segment_width = segment_width
        self.segment_shift = segment_shift
        self.main_iterations = main_iterations
        self.sub_iterations = sub_iterations
        self.similarity_metric = similarity_metric
        self.algorithm = algorithm

    @classmethod
    def from_stft_size(cls, stft_size, similarity_metric='cos'):
        """Default parameterization for stft_size 512/1024
        (reference :164-184)."""
        if stft_size == 512:
            return cls(
                stft_size=stft_size,
                segment_start=70, segment_width=100, segment_shift=20,
                main_iterations=20, sub_iterations=2,
                similarity_metric=similarity_metric,
            )
        elif stft_size == 1024:
            return cls(
                stft_size=stft_size,
                segment_start=100, segment_width=100, segment_shift=20,
                main_iterations=20, sub_iterations=2,
                similarity_metric=similarity_metric,
            )
        else:
            raise ValueError(
                'There is no default for stft_size={}.', stft_size)

    @property
    def alignment_plan(self):
        """Static [(iterations, start, end)] segment plan
        (reference :204-293).

        >>> DHTVPermutationAlignment.from_stft_size(512).alignment_plan
        [[20, 70, 170], [2, 90, 190], [2, 50, 150], [2, 110, 210], \
[2, 30, 130], [2, 130, 230], [2, 0, 110], [2, 150, 257]]
        """
        F = self.stft_size // 2 + 1

        if self.segment_start + self.segment_width > F:
            raise ValueError(
                f'segment_start ({self.segment_start}) '
                f'+ segment_width ({self.segment_width})\n'
                f'must be smaller than stft_size // 2 + 1 ({F}),\n'
                f'but it is {self.segment_start + self.segment_width}'
            )

        plan_lower = [
            [self.sub_iterations, s, s + self.segment_width]
            for s in range(
                self.segment_start + self.segment_shift,
                F - self.segment_width, self.segment_shift)
        ]
        plan_higher = [
            [self.sub_iterations, s, s + self.segment_width]
            for s in range(
                self.segment_start - self.segment_shift, 0,
                -self.segment_shift)
        ]
        first = [
            self.main_iterations,
            self.segment_start,
            self.segment_start + self.segment_width,
        ]
        if len(plan_lower) > 0:
            plan_lower[-1][-1] = F
        else:
            first[-1] = F
        if len(plan_higher) > 0:
            plan_higher[-1][1] = 0
        else:
            first[1] = 0
        return [first] + list(interleave(plan_lower, plan_higher))

    def _align_block(self, features, iterations):
        """Iteratively align all bins of one segment against its centroid.

        Args:
            features: (K, W, T); unit-normalized over T when cos.
            iterations: static int.
        Returns:
            (features, mapping) with mapping (K, W) — the *composed*
            reverse permutation applied within this block.
        """
        K, W, T = features.shape
        identity = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[:, None],
                                    (K, W))

        def cond(carry):
            feats, mapping, changed, it = carry
            return jnp.logical_and(changed, it < iterations)

        def body(carry):
            feats, mapping, changed, it = carry
            centroid = jnp.mean(feats, axis=1)  # (K, T)
            if self.similarity_metric in ('cos',):
                centroid = _parameterized_vector_norm(centroid, axis=-1)
            # score[w, a, b] = <feats[b, w], centroid[a]>
            # (HIGHEST: TPU bf16 passes measurably flip alignment
            # decisions in ambiguous bins, and a streaming warm-up
            # alignment error is written into the state permanently)
            score = jnp.einsum(
                'bwt,at->wab', feats.conj(), centroid,
                precision=jax.lax.Precision.HIGHEST)
            if self.algorithm == 'greedy':
                rev = _greedy_mapping(score.real)  # (W, K)
            else:
                rev = _optimal_mapping(score.real)
            rev_kf = rev.T  # (K, W)
            changed = jnp.any(rev_kf != identity)
            # Apply the per-bin permutation as a one-hot contraction:
            # TPU gathers lower to slow dynamic slices, a (W, K, K)
            # permutation-matrix einsum stays on the VPU/MXU.
            perm = (rev[..., None] == jnp.arange(K)).astype(
                feats.real.dtype)  # (W, K_new, K_old)
            feats = jnp.einsum('wkj,jwt->kwt', perm, feats)
            mapping = jnp.einsum(
                'wkj,jw->kw', perm, mapping.astype(feats.real.dtype)
            ).astype(mapping.dtype)
            return feats, mapping, changed, it + 1

        features, mapping, _, _ = lax.while_loop(
            cond, body,
            (features, identity, jnp.asarray(True), jnp.asarray(0)),
        )
        return features, mapping

    @functools.partial(jax.jit, static_argnames=('self',))
    def calculate_mapping(self, mask):
        """Reverse mapping (K, F) for a permuted mask (K, F, T).

        Sharding note: the plan loop below walks *overlapping*
        frequency segments sequentially, so under an 'f'-sharded mesh
        GSPMD would reshard (allgather) the features once per segment.
        Callers that run inside a frequency-sharded program should
        replicate the (small) mask before calling and re-constrain the
        result — :func:`pb_bss_tpu.pipeline.separate` does exactly
        that; see docs/DESIGN.md, "DHTV under frequency sharding".
        """
        mask = jnp.asarray(mask)
        K, F, _ = mask.shape
        assert F % 2 == 1, (F, 'Sure? Usually F is odd.')

        if self.similarity_metric in ('cos',):
            features = _parameterized_vector_norm(mask, axis=-1)
        else:
            features = mask

        mapping = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[:, None], (K, F))

        for iterations, start, end in self.alignment_plan:
            feats_seg = features[:, start:end, :]
            feats_seg, block_mapping = self._align_block(
                feats_seg, iterations)
            features = features.at[:, start:end, :].set(feats_seg)
            mapping_seg = jnp.take_along_axis(
                mapping[:, start:end], block_mapping, axis=0)
            mapping = mapping.at[:, start:end].set(mapping_seg)
        return mapping

    def __hash__(self):
        return hash((
            type(self).__name__, self.stft_size, self.segment_start,
            self.segment_width, self.segment_shift, self.main_iterations,
            self.sub_iterations, self.similarity_metric, self.algorithm))

    def __eq__(self, other):
        return type(self) is type(other) and hash(self) == hash(other)


class GreedyPermutationAlignment(_PermutationAlignment):
    """Chain alignment over adjacent frequencies (reference :592-700).

    All adjacent-bin score matrices and their greedy assignments are
    computed at once; the recursive mapping composition — a sequential
    F-loop in the reference (:695-699) — is permutation composition,
    which is associative, so it runs as a ``lax.associative_scan``.
    """

    def __init__(self, similarity_metric='euclidean', algorithm='optimal'):
        self.similarity_metric = similarity_metric
        _ScoreMatrix.from_name(similarity_metric)  # validate
        self.algorithm = algorithm

    @functools.partial(jax.jit, static_argnames=('self',))
    def calculate_mapping(self, mask):
        """mask: (K, F, T) -> mapping (K, F)."""
        mask = jnp.asarray(mask)
        K, F, T = mask.shape
        assert K < 10, (K, 'Sure?')
        assert F % 2 == 1, (F, 'Sure? Usually F is odd.', mask.shape)

        get_score = _ScoreMatrix.from_name(self.similarity_metric)
        scores = get_score(mask[:, 1:, :], mask[:, :-1, :])  # (F-1, K, K)
        pairwise = _mapping_from_score_matrix(
            scores, algorithm='greedy')  # (K, F-1)
        mapping = jnp.concatenate(
            [jnp.arange(K, dtype=pairwise.dtype)[:, None], pairwise],
            axis=-1)  # (K, F)

        # final[:, f] = m_f[final[:, f-1]]; op(a, b)[k] = b[a[k]] is
        # associative -> parallel prefix over F.
        def compose(a, b):
            return jnp.take_along_axis(b, a, axis=-1)

        return lax.associative_scan(compose, mapping.T, axis=0).T

    def __hash__(self):
        return hash((
            type(self).__name__, self.similarity_metric, self.algorithm))

    def __eq__(self, other):
        return type(self) is type(other) and hash(self) == hash(other)


class OraclePermutationAlignment(_PermutationAlignment):
    """Align against a reference mask (reference :703-786); used for
    global speaker identification."""

    def __init__(self, similarity_metric='euclidean', algorithm='optimal'):
        assert algorithm in ['greedy', 'optimal'], algorithm
        self.similarity_metric = similarity_metric
        _ScoreMatrix.from_name(similarity_metric)  # validate
        self.algorithm = algorithm

    @functools.partial(jax.jit, static_argnames=('self',))
    def calculate_mapping(self, mask, reference_mask):
        """mask/reference_mask: (K, *F, T) -> mapping (K, *F)."""
        mask = jnp.asarray(mask)
        reference_mask = jnp.asarray(reference_mask)
        assert mask.shape == reference_mask.shape, (
            mask.shape, reference_mask.shape)
        K, *F, T = mask.shape
        assert K < 10, (K, 'Sure?')
        if len(F) == 1:
            assert F[0] % 2 == 1, (F, 'Sure? Usually F is odd.', mask.shape)
        get_score = _ScoreMatrix.from_name(self.similarity_metric)
        score_matrix = get_score(mask, reference_mask)
        return _mapping_from_score_matrix(score_matrix, self.algorithm)

    def __hash__(self):
        return hash((
            type(self).__name__, self.similarity_metric, self.algorithm))

    def __eq__(self, other):
        return type(self) is type(other) and hash(self) == hash(other)
