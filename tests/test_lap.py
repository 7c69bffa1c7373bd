import numpy as np
from scipy.optimize import linear_sum_assignment

from findnpropagate_tpu.ops.lap import solve_lap


def check_optimal(cost, row_valid):
    col_to_row = np.asarray(solve_lap(cost, row_valid))
    # validity: each valid row matched exactly once
    matched_rows = col_to_row[col_to_row >= 0]
    assert len(matched_rows) == row_valid.sum()
    assert len(set(matched_rows.tolist())) == len(matched_rows)
    got_cost = sum(
        cost[r, c] for c, r in enumerate(col_to_row) if r >= 0
    )
    rows, cols = linear_sum_assignment(cost[row_valid])
    want_cost = cost[row_valid][rows, cols].sum()
    assert abs(got_cost - want_cost) < 1e-3, (got_cost, want_cost)


def test_lap_square_small():
    cost = np.array(
        [[4.0, 1.0, 3.0], [2.0, 0.0, 5.0], [3.0, 2.0, 2.0]], np.float32
    )
    check_optimal(cost, np.ones(3, bool))


def test_lap_rectangular_random():
    rng = np.random.RandomState(0)
    for _ in range(5):
        cost = rng.randn(12, 40).astype(np.float32)
        check_optimal(cost, np.ones(12, bool))


def test_lap_with_padded_rows():
    rng = np.random.RandomState(1)
    cost = rng.randn(16, 30).astype(np.float32)
    row_valid = np.zeros(16, bool)
    row_valid[:7] = True
    col_to_row = np.asarray(solve_lap(cost, row_valid))
    matched = col_to_row[col_to_row >= 0]
    assert set(matched.tolist()) <= set(range(7))
    check_optimal(cost, row_valid)


def test_lap_no_valid_rows():
    cost = np.ones((4, 8), np.float32)
    col_to_row = np.asarray(solve_lap(cost, np.zeros(4, bool)))
    assert (col_to_row == -1).all()


def test_lap_large():
    rng = np.random.RandomState(2)
    cost = rng.rand(128, 200).astype(np.float32) * 10
    check_optimal(cost, np.ones(128, bool))
