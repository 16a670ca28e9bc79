"""Reward distribution (synthesizer/src/vm/helpers/rewards.rs).

staking_rewards: pro-rata block reward over stakers with the reference's
guard rails (missing validator, commission > 100, >25% stake skip,
MIN_DELEGATOR_STAKE floor, MAX_COINBASE_REWARD cap) and commission
accounting (validators collect commission on delegated stake; delegators
pay it). proving_rewards: puzzle reward pro-rata by proof target with the
same cap.

All arithmetic is saturating u128/u64 like the reference.
"""
from __future__ import annotations

from .committee import Committee, MIN_DELEGATOR_STAKE
from .target import MAX_COINBASE_REWARD

U64_MAX = (1 << 64) - 1


def staking_rewards(stakers: dict, committee: Committee, block_reward: int) -> dict:
    """stakers: {staker_address: (validator_address, stake)} -> updated map
    (rewards.rs:34)."""
    if not stakers or committee.total_stake == 0 or block_reward == 0:
        return dict(stakers)
    out = {}
    for staker, (validator, stake) in stakers.items():
        member = committee.members.get(validator)
        if member is None:
            out[staker] = (validator, stake)
            continue
        validator_stake, _is_open, commission_rate = member
        if commission_rate > 100:
            out[staker] = (validator, stake)
            continue
        if validator_stake > committee.total_stake // 4:
            out[staker] = (validator, stake)
            continue
        if stake < MIN_DELEGATOR_STAKE and staker != validator:
            out[staker] = (validator, stake)
            continue
        quotient = block_reward * stake // committee.total_stake
        if quotient > MAX_COINBASE_REWARD:
            out[staker] = (validator, stake)
            continue
        staking_reward = quotient
        if staker == validator:
            total_delegated = max(validator_stake - stake, 0)
            dq = block_reward * total_delegated // committee.total_stake
            commission = min(dq * commission_rate // 100, U64_MAX)
            staking_reward = min(staking_reward + commission, U64_MAX)
        else:
            commission = min(quotient * commission_rate // 100, U64_MAX)
            staking_reward = max(staking_reward - commission, 0)
        out[staker] = (validator, min(stake + staking_reward, U64_MAX))
    return out


def proving_rewards(proof_targets: list, puzzle_reward: int) -> dict:
    """proof_targets: [(address, target)] -> {address: reward}
    (rewards.rs:103)."""
    combined = sum(t for _, t in proof_targets)
    if not proof_targets or combined == 0 or puzzle_reward == 0:
        return {}
    rewards = {}
    for address, target in proof_targets:
        quotient = puzzle_reward * target // max(combined, 1)
        if quotient > MAX_COINBASE_REWARD:
            continue
        if quotient > 0:
            rewards[address] = min(rewards.get(address, 0) + quotient, U64_MAX)
    return rewards
