"""Consensus target & reward math (ledger/block/src/helpers/target.rs) —
exact integer port: ASERT-style retargeting with the 16-bit fixed-point
2^x approximation, coinbase/block/puzzle rewards with year-10 decay.
"""
from __future__ import annotations

MAX_COINBASE_REWARD = 190_258_739
U64 = (1 << 64) - 1

# MainnetV0 constants (console/network/src/lib.rs)
ANCHOR_TIME = 25
BLOCK_TIME = 10
ANCHOR_HEIGHT = ANCHOR_TIME // BLOCK_TIME
NUM_BLOCKS_PER_EPOCH = 360
GENESIS_COINBASE_TARGET = (1 << 29) - 1
GENESIS_PROOF_TARGET = 1 << 27
MAX_SOLUTIONS_AS_POWER_OF_TWO = 2
STARTING_SUPPLY = 1_500_000_000_000_000


def block_height_at_year(block_time: int, num_years: int) -> int:
    seconds_in_year = 60 * 60 * 24 * 365
    return (seconds_in_year // block_time) * num_years


def block_reward(total_supply: int, block_time: int, coinbase_reward_: int, transaction_fees: int) -> int:
    annual = total_supply // 20
    return annual // block_height_at_year(block_time, 1) + coinbase_reward_ // 3 + transaction_fees


def puzzle_reward(coinbase_reward_: int) -> int:
    return min(coinbase_reward_ * 2, (1 << 128) - 1) // 3


def _block_reward_at_height(height, starting_supply, anchor_height, block_time):
    y10 = block_height_at_year(block_time, 10)
    remaining = max(0, y10 - height)
    num = 2 * starting_supply * anchor_height * remaining
    den = y10 * (y10 + 1)
    return num // den


def anchor_block_reward_at_height(height, starting_supply, anchor_height, block_time):
    y9 = block_height_at_year(block_time, 9)
    r9 = _block_reward_at_height(y9, starting_supply, anchor_height, block_time)
    rh = _block_reward_at_height(height, starting_supply, anchor_height, block_time)
    return max(rh, r9)


def coinbase_reward(block_height, starting_supply, anchor_height, block_time,
                    combined_proof_target, cumulative_proof_target, coinbase_target_) -> int:
    remaining_coinbase = max(0, coinbase_target_ - cumulative_proof_target)
    remaining_proof = min(combined_proof_target, remaining_coinbase)
    anchor_reward = anchor_block_reward_at_height(block_height, starting_supply, anchor_height, block_time)
    reward = anchor_reward * remaining_proof // coinbase_target_
    assert reward <= MAX_COINBASE_REWARD, "coinbase reward exceeds maximum"
    return reward


def retarget(previous_target, previous_ts, ts, anchor_time, half_life, is_inverse) -> int:
    elapsed = max(1, ts - previous_ts)
    drift = elapsed - anchor_time
    if drift == 0:
        return previous_target
    if is_inverse:
        drift = -drift
    RBITS = 16
    RADIX = 1 << RBITS
    exponent = (RADIX * drift) // half_life
    integral = exponent >> RBITS
    fractional = exponent - (integral << RBITS)
    assert 0 <= fractional < RADIX
    frac_mult = RADIX + ((195_766_423_245_049 * fractional
                          + 971_821_376 * fractional ** 2
                          + 5_127 * fractional ** 3
                          + 2 ** (RBITS * 3 - 1)) >> (RBITS * 3))
    candidate = previous_target * frac_mult
    shifts = integral - RBITS
    if shifts < 0:
        candidate = max(candidate >> (-shifts), 1) if -shifts < 128 else 1
    else:
        candidate = max(candidate << shifts, 1) if shifts < 128 else U64
    candidate = min(candidate, U64)
    return candidate


def coinbase_target(previous_target, previous_ts, ts, anchor_time=ANCHOR_TIME,
                    num_blocks_per_epoch=NUM_BLOCKS_PER_EPOCH,
                    genesis_target=GENESIS_COINBASE_TARGET) -> int:
    half_life = (num_blocks_per_epoch // 2) * anchor_time
    return max(retarget(previous_target, previous_ts, ts, anchor_time, half_life, True),
               genesis_target)


def proof_target(coinbase_target_, genesis_proof_target=GENESIS_PROOF_TARGET,
                 max_solutions_pow2=MAX_SOLUTIONS_AS_POWER_OF_TWO) -> int:
    return (coinbase_target_ >> max_solutions_pow2) + 1


def to_next_targets(latest_cumulative_proof_target, combined_proof_target,
                    latest_coinbase_target, latest_cumulative_weight,
                    last_coinbase_target, last_coinbase_timestamp, next_timestamp):
    """(next_coinbase_target, next_proof_target, next_cumulative_proof_target,
        next_cumulative_weight, next_last_coinbase_target, next_last_coinbase_timestamp)"""
    threshold = latest_coinbase_target // 2
    next_cumulative = latest_cumulative_proof_target + combined_proof_target
    reached = next_cumulative >= threshold
    next_coinbase = coinbase_target(last_coinbase_target, last_coinbase_timestamp, next_timestamp)
    next_proof = proof_target(next_coinbase)
    next_cumulative_weight = latest_cumulative_weight + combined_proof_target
    if reached:
        return (next_coinbase, next_proof, 0, next_cumulative_weight,
                next_coinbase, next_timestamp)
    return (next_coinbase, next_proof, next_cumulative, next_cumulative_weight,
            last_coinbase_target, last_coinbase_timestamp)
