"""Rewrite passes preserve semantics and produce the expected shapes.

Mirrors the reference's transform tests (SURVEY.md §4): each pass applied to
a small tree must evaluate identically to the original.
"""
import numpy as np
import pytest

import indigo_tpu as it
from indigo_tpu.transforms import (
    DistributeAdjointOverProduct, DistributeKronIOverProduct,
    RealizeMatrices, Associativity, FoldScale, optimize,
)
from indigo_tpu.operators import Product, Adjoint, KronI, SpMatrix, Diag, Eye
from indigo_tpu.utils import rand64c, randM, rel_err


def assert_equiv(a, b, rng, tol=2e-5):
    assert a.shape == b.shape
    x = rand64c(a.shape[1], 2, rng=rng)
    assert rel_err(np.asarray(a * x), np.asarray(b * x)) < tol
    y = rand64c(a.shape[0], 2, rng=rng)
    assert rel_err(np.asarray(a.H * y), np.asarray(b.H * y)) < tol


def test_distribute_adjoint(rng):
    A = it.DenseMatrix(rand64c(6, 8, rng=rng))
    B = it.SpMatrix(randM(8, 10, 0.3, rng=rng))
    tree = (A * B).H
    out = DistributeAdjointOverProduct().visit(tree)
    assert isinstance(out, Product)
    assert_equiv(tree, out, rng)
    # adjoint pushed to leaves: no Adjoint-of-Product remains
    def no_adj_of_combinator(n):
        if isinstance(n, Adjoint):
            assert not isinstance(n.child, (Product, KronI))
        for c in n.children():
            no_adj_of_combinator(c)
    no_adj_of_combinator(out)


def test_distribute_kroni(rng):
    A = it.DenseMatrix(rand64c(4, 5, rng=rng))
    B = it.DenseMatrix(rand64c(5, 6, rng=rng))
    tree = KronI(3, A * B)
    out = DistributeKronIOverProduct().visit(tree)
    assert isinstance(out, Product)
    assert_equiv(tree, out, rng)
    nested = KronI(2, KronI(3, A))
    flat = DistributeKronIOverProduct().visit(nested)
    assert isinstance(flat, KronI) and flat.c == 6
    assert_equiv(nested, flat, rng)
    one = DistributeKronIOverProduct().visit(KronI(1, A))
    assert one is A


def test_associativity(rng):
    A = it.DenseMatrix(rand64c(4, 5, rng=rng))
    B = it.DenseMatrix(rand64c(5, 6, rng=rng))
    C = it.DenseMatrix(rand64c(6, 7, rng=rng))
    tree = (A * B) * C
    out = Associativity().visit(tree)
    assert isinstance(out, Product) and not isinstance(out.left, Product)
    assert_equiv(tree, out, rng)


def test_fold_scale(rng):
    A = it.DenseMatrix(rand64c(5, 5, rng=rng))
    B = it.DenseMatrix(rand64c(5, 5, rng=rng))
    tree = (2.0 * A) * (3.0 * B)
    out = FoldScale().visit(tree)
    assert_equiv(tree, out, rng)
    from indigo_tpu.operators import Scale
    assert isinstance(out, Scale)
    assert not isinstance(out.child.left, Scale)


def test_realize_matrices(rng):
    S1 = it.SpMatrix(randM(10, 12, 0.3, rng=rng))
    S2 = it.SpMatrix(randM(12, 9, 0.3, rng=rng))
    tree = S1 * S2
    out = RealizeMatrices().visit(tree)
    assert isinstance(out, SpMatrix)
    assert_equiv(tree, out, rng)


def test_realize_through_chain(rng):
    """Diag * Sp * FFT: the two left leaves fuse, FFT stays."""
    d = it.Diag(rand64c(12, rng=rng))
    S = it.SpMatrix(randM(12, 12, 0.3, rng=rng))
    F = it.UnscaledFFT((12,))
    tree = d * (S * F)
    out = RealizeMatrices().visit(tree)
    assert isinstance(out, Product)
    assert isinstance(out.left, SpMatrix)
    assert out.left.shape == (12, 12)
    assert_equiv(tree, out, rng)


def test_realize_eye_elision(rng):
    A = it.DenseMatrix(rand64c(6, 6, rng=rng))
    tree = Product(Eye(6), A)
    out = RealizeMatrices().visit(tree)
    assert out is A or not isinstance(out, Product)
    assert_equiv(tree, out, rng)


def test_full_optimize_pipeline(rng):
    """A realistic SENSE-like tree survives the full default recipe."""
    n = 8
    F = it.UnscaledFFT((n,))
    mask = randM(5, n, 0.4, rng=rng)
    P = it.SpMatrix(mask)
    S = it.Diag(rand64c(n, rng=rng))
    A = KronI(2, P * F * S)
    AH_A = A.H * A
    opt = optimize(AH_A)
    assert_equiv(AH_A, opt, rng)
    out = optimize(A)
    assert_equiv(A, out, rng)


def test_associativity_deep_right_lean(rng):
    """Left-nested chains with product-valued middle factors must come out
    fully right-leaning (the pairwise (AB)C->A(BC) rewrite alone leaves
    Product-left nodes that hide adjacencies from RealizeMatrices)."""
    ops = [it.DenseMatrix(rand64c(6, 6, rng=rng)) for _ in range(5)]
    tree = Product(Product(ops[0], Product(ops[1], ops[2])),
                   Product(ops[3], ops[4]))
    out = Associativity().visit(tree)

    def check(n):
        if isinstance(n, Product):
            assert not isinstance(n.left, Product)
            check(n.right)
    check(out)
    assert_equiv(tree, out, rng)


def test_mask_normal_fuses_to_diag(rng):
    """optimize(A.H A) on a Cartesian SENSE tree fuses Mask.H . Mask into a
    0/1 Diag — the reference's RealizeMatrices spGEMM result for the 0/1
    sampling matrix (SURVEY.md §3.2); no gather leaf survives in the
    normal-op hot loop."""
    from indigo_tpu.models import cartesian_sense_op
    from indigo_tpu.operators import Mask
    n = 8
    mask = np.zeros((n, n), bool)
    mask[rng.random((n, n)) < 0.5] = True
    mask[3:5] = True
    maps = rand64c(2, n, n, rng=rng)
    A = cartesian_sense_op(mask, np.asarray(maps))
    AHA = A.H * A
    opt = optimize(AHA)

    def leaves(node):
        for attr in ("left", "right", "child"):
            c = getattr(node, attr, None)
            if c is not None:
                yield from leaves(c)
        for b in getattr(node, "blocks", []) or []:
            yield from leaves(b)
        yield node

    kinds = {type(l).__name__ for l in leaves(opt)}
    assert "Mask" not in kinds, kinds
    assert_equiv(AHA, opt, rng)
