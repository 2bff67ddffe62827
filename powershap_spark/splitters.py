"""Vendored cross-validators with sklearn-exact semantics (sklearn is absent
in this environment; the reference accepts any sklearn splitter).

The reference wraps a user-supplied splitter in an infinite re-seeding
generator (``/root/reference/powershap/powershap.py:144-176``): on
exhaustion the splitter's ``random_state`` is set to an incrementing counter
and the split stream restarts. ``InfiniteSplitter`` reproduces that exactly,
plus a ``fast_forward`` hook so the partition-parallel Spark backend can
reconstruct the stream position inside an executor UDF (the stream is a pure
function of (cv, n, y, groups, position)).

Split index semantics are reimplemented from the public scikit-learn
algorithm descriptions / source (BSD-3), matched RNG-call-for-RNG-call:

- ``ShuffleSplit``: one ``RandomState.permutation(n)`` per split; test =
  first ``n_test``, train = next ``n_train``.
- ``StratifiedShuffleSplit``: the approximate-mode allocation
  (floor + largest-remainder draws via ``rng.choice``) then per-class
  permutations, exactly the draw order sklearn uses — this is what
  ``train_test_split(..., stratify=...)`` delegates to (and what the
  reference calls at ``shap_explainer.py:119-123``).
- ``GroupShuffleSplit``: ShuffleSplit over the sorted unique groups.
- ``KFold`` / ``StratifiedKFold`` / ``GroupKFold``: mask-based contiguous /
  allocation-interleaved / balanced-greedy folds.
- ``StratifiedGroupKFold``: the greedy variance-minimizing assignment; under
  ``shuffle=True`` the per-group counts-matrix rows are shuffled IN PLACE
  with the permutation untracked — decoupling each group's identity from
  its counts row — exactly replicating sklearn's implementation quirk.

All ``split`` methods take (X, y=None, groups=None) and yield
(train_idx, test_idx) position arrays, mirroring the sklearn API shape the
reference's ``cv`` contract requires (powershap.py:104-113).
"""

from __future__ import annotations

import copy

import numpy as np

__all__ = [
    "ShuffleSplit",
    "StratifiedShuffleSplit",
    "GroupShuffleSplit",
    "KFold",
    "StratifiedKFold",
    "GroupKFold",
    "StratifiedGroupKFold",
    "InfiniteSplitter",
    "approximate_mode",
]


def check_random_state(seed):
    if seed is None:
        return np.random.RandomState()
    if isinstance(seed, (int, np.integer)):
        return np.random.RandomState(int(seed))
    if isinstance(seed, np.random.RandomState):
        return seed
    raise ValueError(f"cannot seed RandomState from {seed!r}")


def _num_samples(X=None, y=None, groups=None):
    for a in (X, y, groups):
        if a is None:
            continue
        if hasattr(a, "shape") and len(getattr(a, "shape")) > 0:
            return int(a.shape[0])
        if isinstance(a, (int, np.integer)):
            return int(a)
        return len(a)
    raise ValueError("need X, y, or groups to infer n_samples")


def _validate_shuffle_split(n_samples, test_size, train_size, default_test_size):
    """sklearn's n_train/n_test resolution: float test -> ceil, float
    train -> floor; the two always partition n when the other is None."""
    if test_size is None and train_size is None:
        test_size = default_test_size
    if test_size is not None:
        n_test = (
            int(np.ceil(test_size * n_samples))
            if isinstance(test_size, float)
            else int(test_size)
        )
    if train_size is not None:
        n_train = (
            int(np.floor(train_size * n_samples))
            if isinstance(train_size, float)
            else int(train_size)
        )
    if test_size is None:
        n_test = n_samples - n_train
    if train_size is None:
        n_train = n_samples - n_test
    if n_train + n_test > n_samples:
        raise ValueError("train + test sizes exceed n_samples")
    if n_test < 1 or n_train < 1:
        raise ValueError(
            f"resulting split is degenerate: n_train={n_train}, n_test={n_test}"
        )
    return int(n_train), int(n_test)


def approximate_mode(class_counts, n_draws, rng):
    """Draw ``n_draws`` from classes proportionally: floor the continuous
    allocation, then distribute the remaining draws to the largest
    fractional remainders, breaking ties with ``rng.choice`` — sklearn's
    ``_approximate_mode``, the allocation StratifiedShuffleSplit is built on."""
    class_counts = np.asarray(class_counts, dtype=np.float64)
    continuous = class_counts / class_counts.sum() * n_draws
    floored = np.floor(continuous)
    need_to_add = int(n_draws - floored.sum())
    if need_to_add > 0:
        remainder = continuous - floored
        values = np.sort(np.unique(remainder))[::-1]
        for value in values:
            (inds,) = np.where(remainder == value)
            add_now = int(min(len(inds), need_to_add))
            inds = rng.choice(inds, size=add_now, replace=False)
            floored[inds] += 1
            need_to_add -= add_now
            if need_to_add == 0:
                break
    return floored.astype(int)


# ---------------------------------------------------------------------------
# Shuffle-split family (returns unsorted index arrays, like sklearn's
# BaseShuffleSplit; the powershap loop sorts them downstream,
# shap_explainer.py:153-156)
# ---------------------------------------------------------------------------


class ShuffleSplit:
    _default_test_size = 0.1

    def __init__(self, n_splits=10, *, test_size=None, train_size=None, random_state=None):
        self.n_splits = n_splits
        self.test_size = test_size
        self.train_size = train_size
        self.random_state = random_state

    def get_n_splits(self, X=None, y=None, groups=None):
        return self.n_splits

    def _iter_indices(self, X=None, y=None, groups=None):
        n = _num_samples(X, y, groups)
        n_train, n_test = _validate_shuffle_split(
            n, self.test_size, self.train_size, self._default_test_size
        )
        rng = check_random_state(self.random_state)
        for _ in range(self.n_splits):
            permutation = rng.permutation(n)
            ind_test = permutation[:n_test]
            ind_train = permutation[n_test : (n_test + n_train)]
            yield ind_train, ind_test

    def split(self, X=None, y=None, groups=None):
        return self._iter_indices(X, y, groups)


class StratifiedShuffleSplit(ShuffleSplit):
    _default_test_size = 0.1

    def _iter_indices(self, X=None, y=None, groups=None):
        n = _num_samples(X, y, groups)
        y = np.asarray(y)
        n_train, n_test = _validate_shuffle_split(
            n, self.test_size, self.train_size, self._default_test_size
        )
        classes, y_indices = np.unique(y, return_inverse=True)
        n_classes = classes.shape[0]
        class_counts = np.bincount(y_indices)
        if np.min(class_counts) < 2:
            raise ValueError("the least populated class has only 1 member")
        if n_train < n_classes or n_test < n_classes:
            raise ValueError(
                f"train/test sizes {n_train}/{n_test} < n_classes {n_classes}"
            )
        class_indices = np.split(
            np.argsort(y_indices, kind="mergesort"), np.cumsum(class_counts)[:-1]
        )
        rng = check_random_state(self.random_state)
        for _ in range(self.n_splits):
            n_i = approximate_mode(class_counts, n_train, rng)
            class_counts_remaining = class_counts - n_i
            t_i = approximate_mode(class_counts_remaining, n_test, rng)
            train, test = [], []
            for i in range(n_classes):
                permutation = rng.permutation(class_counts[i])
                perm_indices_class_i = class_indices[i].take(permutation, mode="clip")
                train.extend(perm_indices_class_i[: n_i[i]])
                test.extend(perm_indices_class_i[n_i[i] : n_i[i] + t_i[i]])
            train = rng.permutation(train)
            test = rng.permutation(test)
            yield train, test


class GroupShuffleSplit(ShuffleSplit):
    _default_test_size = 0.2

    def _iter_indices(self, X=None, y=None, groups=None):
        if groups is None:
            raise ValueError("The 'groups' parameter should not be None.")
        groups = np.asarray(groups)
        classes, group_indices = np.unique(groups, return_inverse=True)
        inner = ShuffleSplit(
            n_splits=self.n_splits,
            test_size=self.test_size,
            train_size=self.train_size,
            random_state=self.random_state,
        )
        inner._default_test_size = self._default_test_size
        for group_train, group_test in inner._iter_indices(X=classes):
            train = np.flatnonzero(np.isin(group_indices, group_train))
            test = np.flatnonzero(np.isin(group_indices, group_test))
            yield train, test


# ---------------------------------------------------------------------------
# KFold family (mask-based: sorted train/test arrays, like BaseCrossValidator)
# ---------------------------------------------------------------------------


class _BaseKFold:
    def __init__(self, n_splits=5, *, shuffle=False, random_state=None):
        if n_splits < 2:
            raise ValueError("n_splits must be >= 2")
        if not shuffle and random_state is not None:
            # sklearn raises here; the reference's infinite wrapper SETS
            # random_state blindly on any cv that has the attribute, so we
            # accept-and-ignore to keep KFold(shuffle=False) usable under it.
            random_state = None
        self.n_splits = n_splits
        self.shuffle = shuffle
        self.random_state = random_state

    def get_n_splits(self, X=None, y=None, groups=None):
        return self.n_splits

    def split(self, X=None, y=None, groups=None):
        n = _num_samples(X, y, groups)
        if self.n_splits > n:
            raise ValueError(f"n_splits={self.n_splits} > n_samples={n}")
        indices = np.arange(n)
        for test_index in self._iter_test_indices(X, y, groups):
            test_mask = np.zeros(n, dtype=bool)
            test_mask[test_index] = True
            yield indices[~test_mask], indices[test_mask]


class KFold(_BaseKFold):
    def _iter_test_indices(self, X=None, y=None, groups=None):
        n = _num_samples(X, y, groups)
        indices = np.arange(n)
        if self.shuffle:
            check_random_state(self.random_state).shuffle(indices)
        fold_sizes = np.full(self.n_splits, n // self.n_splits, dtype=int)
        fold_sizes[: n % self.n_splits] += 1
        current = 0
        for fold_size in fold_sizes:
            yield indices[current : current + fold_size]
            current += fold_size


class StratifiedKFold(_BaseKFold):
    def _make_test_folds(self, y):
        rng = check_random_state(self.random_state)
        y = np.asarray(y)
        # class encoding in order of first appearance (sklearn's y_idx dance)
        _, y_idx, y_inv = np.unique(y, return_index=True, return_inverse=True)
        _, class_perm = np.unique(y_idx, return_inverse=True)
        y_encoded = class_perm[y_inv]
        n_classes = len(y_idx)
        y_counts = np.bincount(y_encoded)
        if np.all(self.n_splits > y_counts):
            raise ValueError("n_splits > number of members in each class")
        y_order = np.sort(y_encoded)
        allocation = np.asarray(
            [
                np.bincount(y_order[i :: self.n_splits], minlength=n_classes)
                for i in range(self.n_splits)
            ]
        )
        test_folds = np.empty(len(y), dtype="i")
        for k in range(n_classes):
            folds_for_class = np.arange(self.n_splits).repeat(allocation[:, k])
            if self.shuffle:
                rng.shuffle(folds_for_class)
            test_folds[y_encoded == k] = folds_for_class
        return test_folds

    def _iter_test_indices(self, X=None, y=None, groups=None):
        test_folds = self._make_test_folds(y)
        for i in range(self.n_splits):
            yield np.flatnonzero(test_folds == i)


class GroupKFold(_BaseKFold):
    def __init__(self, n_splits=5):
        super().__init__(n_splits, shuffle=False, random_state=None)

    def _iter_test_indices(self, X=None, y=None, groups=None):
        if groups is None:
            raise ValueError("The 'groups' parameter should not be None.")
        unique_groups, groups = np.unique(np.asarray(groups), return_inverse=True)
        n_groups = len(unique_groups)
        if self.n_splits > n_groups:
            raise ValueError(
                f"n_splits={self.n_splits} > n_groups={n_groups}"
            )
        n_samples_per_group = np.bincount(groups)
        # largest group first; greedily assign to the lightest fold
        order = np.argsort(n_samples_per_group)[::-1]
        n_samples_per_fold = np.zeros(self.n_splits)
        group_to_fold = np.zeros(n_groups, dtype=int)
        for group_index, weight in enumerate(n_samples_per_group[order]):
            lightest_fold = int(np.argmin(n_samples_per_fold))
            n_samples_per_fold[lightest_fold] += weight
            group_to_fold[order[group_index]] = lightest_fold
        fold_of_row = group_to_fold[groups]
        for f in range(self.n_splits):
            yield np.flatnonzero(fold_of_row == f)


class StratifiedGroupKFold(_BaseKFold):
    """Greedy variance-minimizing group assignment (the Kaggle-kernel
    algorithm sklearn adopted). The reference uses this for the
    stratify+groups split (shap_explainer.py:136-141)."""

    def _iter_test_indices(self, X=None, y=None, groups=None):
        if groups is None:
            raise ValueError("The 'groups' parameter should not be None.")
        rng = check_random_state(self.random_state)
        y = np.asarray(y)
        _, y_inv, y_cnt = np.unique(y, return_inverse=True, return_counts=True)
        if np.all(self.n_splits > y_cnt):
            raise ValueError("n_splits > number of members in each class")
        n_classes = len(y_cnt)
        _, groups_inv, groups_cnt = np.unique(
            np.asarray(groups), return_inverse=True, return_counts=True
        )
        n_groups = len(groups_cnt)
        y_counts_per_group = np.zeros((n_groups, n_classes))
        for class_idx, group_idx in zip(y_inv, groups_inv):
            y_counts_per_group[group_idx, class_idx] += 1

        y_counts_per_fold = np.zeros((self.n_splits, n_classes))
        groups_per_fold = [set() for _ in range(self.n_splits)]

        # sklearn-exact shuffle quirk: the counts-matrix ROWS are shuffled
        # IN PLACE with the permutation untracked, so from here on
        # "group_idx" refers to a shuffled counts row while the final
        # test-index selection still matches against the ORIGINAL encoded
        # groups — group identity is deliberately decoupled from its counts
        # row, exactly like sklearn's StratifiedGroupKFold(shuffle=True)
        # (an upstream quirk the parity contract must reproduce; a previous
        # version here kept identity attached and diverged from sklearn)
        if self.shuffle:
            rng.shuffle(y_counts_per_group)

        # stable sort keeps shuffled order for equal-variance groups
        sorted_order = np.argsort(
            -np.std(y_counts_per_group, axis=1), kind="mergesort"
        )

        for group_idx in sorted_order:
            group_y_counts = y_counts_per_group[group_idx]
            best_fold = self._find_best_fold(
                y_counts_per_fold, y_cnt, group_y_counts
            )
            y_counts_per_fold[best_fold] += group_y_counts
            groups_per_fold[best_fold].add(group_idx)

        for i in range(self.n_splits):
            yield np.flatnonzero(np.isin(groups_inv, list(groups_per_fold[i])))

    def _find_best_fold(self, y_counts_per_fold, y_cnt, group_y_counts):
        best_fold = None
        min_eval = np.inf
        min_samples_in_fold = np.inf
        for i in range(self.n_splits):
            y_counts_per_fold[i] += group_y_counts
            std_per_class = np.std(y_counts_per_fold / y_cnt.reshape(1, -1), axis=0)
            y_counts_per_fold[i] -= group_y_counts
            fold_eval = float(np.mean(std_per_class))
            samples_in_fold = float(np.sum(y_counts_per_fold[i]))
            better = fold_eval < min_eval or (
                np.isclose(fold_eval, min_eval)
                and samples_in_fold < min_samples_in_fold
            )
            if better:
                min_eval = fold_eval
                min_samples_in_fold = samples_in_fold
                best_fold = i
        return best_fold


# ---------------------------------------------------------------------------
# The reference's infinite re-seeding wrapper (powershap.py:144-176)
# ---------------------------------------------------------------------------


class InfiniteSplitter:
    """Yield (train, test) forever: when the wrapped splitter exhausts, set
    ``cv.random_state`` to an incrementing counter (if the attribute exists)
    and restart. State persists across ``split()`` calls — exactly the
    closure semantics of the reference's ``_infinite_splitter``: the stream
    is GLOBAL to the selector, continuing across explain batches and
    convergence rounds.

    ``at_position`` builds a fresh generator fast-forwarded to an absolute
    stream position — how the Spark backend reconstructs the stream inside
    an executor task (the stream is deterministic in (cv, inputs, position)).
    """

    def __init__(self, cv):
        self.cv = copy.deepcopy(cv)
        self._splitter = None
        self._random_state = 0

    def _reset(self, X, y, groups):
        if hasattr(self.cv, "random_state"):
            setattr(self.cv, "random_state", self._random_state)
            self._random_state += 1
        self._splitter = self.cv.split(X, y=y, groups=groups)

    def split(self, X, y=None, groups=None):
        if self._splitter is None:
            self._reset(X, y, groups)
        while True:
            try:
                yield next(self._splitter)
            except StopIteration:
                self._reset(X, y, groups)
                yield next(self._splitter)

    def at_position(self, position: int, X, y=None, groups=None):
        """O(position % n_splits) reconstruction, not O(position): cycle ``c``
        of the stream runs the wrapped cv with ``random_state = c`` (or
        identically when it has no random_state), so jumping means setting
        the re-seed counter to ``position // n_splits`` and generating only
        the within-cycle offset. Positions grow monotonically across explain
        batches in long automatic/convergence runs — the sequential
        fast-forward was quadratic over a selector's lifetime.

        Assumes ``get_n_splits`` reports the true number of splits per
        cycle (the sklearn contract); a cv without a usable ``get_n_splits``
        falls back to the sequential walk."""
        fresh = InfiniteSplitter(self.cv)
        k = None
        try:
            k = int(self.cv.get_n_splits(X, y, groups))
        except TypeError:
            try:
                k = int(self.cv.get_n_splits())
            except Exception:
                k = None
        except Exception:
            k = None
        if k and k > 0 and position >= k:
            # cycle c uses random_state=c when the attribute exists;
            # without the attribute every cycle is identical, so the
            # modulo alone is the jump
            fresh._random_state = position // k
            position = position % k
        gen = fresh.split(X, y=y, groups=groups)
        for _ in range(position):
            next(gen)
        return gen
