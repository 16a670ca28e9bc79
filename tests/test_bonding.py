"""credits.aleo staking lifecycle through the finalize engine
(mirrors synthesizer/process/src/tests/test_credits.rs bonding scenarios:
bond_validator, bond_public, unbond_public, claim_unbond_public,
set_validator_state)."""
import random

import pytest

from snarkvm_tpu.console import account
from snarkvm_tpu.console.types import Plaintext, literal_from_str
from snarkvm_tpu.synthesizer.program import parse_program
from snarkvm_tpu.synthesizer.process import Stack
from snarkvm_tpu.synthesizer import finalize as F
from snarkvm_tpu.synthesizer.finalize import _key_of

rng = random.Random(2718)

CREDITS = open("snarkvm_tpu/synthesizer/resources/credits.aleo").read()

MIN_VALIDATOR_SELF_STAKE = 100_000_000     # 100 credits (program constant)
MIN_VALIDATOR_TOTAL = 10_000_000_000_000   # 10M credits self+delegated floor
MIN_DELEGATOR_STAKE = 10_000_000_000       # 10_000 credits
UNBONDING_PERIOD = 360                     # blocks


def _addr_str(pt):
    from snarkvm_tpu.utils.encoding import bech32m_encode
    return bech32m_encode("aleo", pt[0].to_bytes(32, "little"))

def _struct(pt):
    """Flatten a Plaintext struct into {member_name: literal_value}."""
    return {k.name: (v.value.value if v.kind == "literal" else v)
            for k, v in pt.value}


class Env:
    def __init__(self):
        self.stack = Stack(parse_program(CREDITS))
        self.store = F.FinalizeStore()
        self.height = 100

    def seed_balance(self, addr_str, amount):
        self.store.mapping("credits.aleo", "account").insert(
            _key_of(literal_from_str(addr_str)), Plaintext.literal("u64", amount))

    def run(self, function, inputs, signer_key, expect_accept=True, height=None):
        """authorize-free console run + speculate of the finalize future."""
        signer = signer_key.to_address()
        outs = self.stack.evaluate_function(
            function, inputs, signer=signer, caller=signer)
        fut = outs[-1]
        assert fut.kind == "future"
        _, fname, args = fut.value
        assert fname == function
        state = F.FinalizeGlobalState(block_height=height or self.height)
        acc, rej = F.speculate({"credits.aleo": self.stack},
                               [("credits.aleo", function, args, 1)],
                               self.store, state)
        # commit either way: a rejected tx was rewound inside speculate,
        # the block (with its Rejected entry) still finalizes
        F.finalize_commit(self.store)
        if expect_accept:
            assert acc == [0], f"{function} unexpectedly rejected"
        else:
            assert rej == [0], f"{function} unexpectedly accepted"
        return acc, rej

    def get(self, mapping, addr_str):
        v = self.store.mapping("credits.aleo", mapping).get_confirmed(
            _key_of(literal_from_str(addr_str)))
        return v

    def balance(self, addr_str):
        v = self.get("account", addr_str)
        return v.value.value if v is not None else None


@pytest.fixture(scope="module")
def env_keys():
    env = Env()
    val = account.PrivateKey.new(rng)
    val_w = account.PrivateKey.new(rng)       # validator withdrawal address
    dele = account.PrivateKey.new(rng)
    dele_w = account.PrivateKey.new(rng)
    return env, val, val_w, dele, dele_w


def test_bond_validator_lifecycle(env_keys):
    env, val, val_w, dele, dele_w = env_keys
    v_str, vw_str = _addr_str(val.to_address()), _addr_str(val_w.to_address())
    d_str, dw_str = _addr_str(dele.to_address()), _addr_str(dele_w.to_address())

    env.seed_balance(v_str, 2 * MIN_VALIDATOR_TOTAL)
    env.seed_balance(d_str, 10 * MIN_DELEGATOR_STAKE)

    # 1. validator self-bonds the 10M-credit floor with a 10% commission
    env.run("bond_validator",
            [vw_str, f"{MIN_VALIDATOR_TOTAL}u64", "10u8"], val)
    bonded = env.get("bonded", v_str)
    assert bonded is not None
    by_name = _struct(bonded)
    assert by_name["validator"] == val.to_address()
    assert by_name["microcredits"] == MIN_VALIDATOR_TOTAL
    assert env.balance(v_str) == MIN_VALIDATOR_TOTAL
    # withdraw address registered
    assert env.get("withdraw", v_str).value.value == val_w.to_address()
    # 'delegated' tracks self-bond + delegations (credits.aleo:231)
    assert env.get("delegated", v_str).value.value == MIN_VALIDATOR_TOTAL

    # 2. a delegator bonds to the (open) validator
    env.run("bond_public",
            [v_str, dw_str, f"{MIN_DELEGATOR_STAKE}u64"], dele)
    dbond = _struct(env.get("bonded", d_str))
    assert dbond["validator"] == val.to_address()
    assert dbond["microcredits"] == MIN_DELEGATOR_STAKE
    assert env.get("delegated", v_str).value.value == \
        MIN_VALIDATOR_TOTAL + MIN_DELEGATOR_STAKE
    assert env.balance(d_str) == 9 * MIN_DELEGATOR_STAKE

    # 3. the delegator's WITHDRAWAL address unbonds everything (only the
    #    withdrawal address — or the validator's — may unbond,
    #    credits.aleo finalize unbond_public permission check)
    env.run("unbond_public", [d_str, f"{MIN_DELEGATOR_STAKE}u64"], dele,
            expect_accept=False)     # staker itself is NOT permitted
    env.run("unbond_public", [d_str, f"{MIN_DELEGATOR_STAKE}u64"], dele_w)
    assert env.get("bonded", d_str) is None
    unb = _struct(env.get("unbonding", d_str))
    assert unb["microcredits"] == MIN_DELEGATOR_STAKE
    assert unb["height"] == env.height + UNBONDING_PERIOD

    # 4. claim too early is rejected; claim after the period credits the
    #    WITHDRAWAL address
    env.run("claim_unbond_public", [d_str], dele, expect_accept=False,
            height=env.height + UNBONDING_PERIOD - 1)
    env.run("claim_unbond_public", [d_str], dele,
            height=env.height + UNBONDING_PERIOD)
    assert env.get("unbonding", d_str) is None
    assert env.balance(dw_str) == MIN_DELEGATOR_STAKE

    # 5. validator closes to new stakers; a fresh delegator is rejected
    env.run("set_validator_state", ["false"], val)
    comm = _struct(env.get("committee", v_str))
    assert comm["is_open"] is False
    fresh = account.PrivateKey.new(rng)
    f_str = _addr_str(fresh.to_address())
    env.seed_balance(f_str, 10 * MIN_DELEGATOR_STAKE)
    env.run("bond_public", [v_str, f_str, f"{MIN_DELEGATOR_STAKE}u64"],
            fresh, expect_accept=False)


def test_bond_validator_rejects_bad_inputs():
    env = Env()
    val = account.PrivateKey.new(rng)
    w = account.PrivateKey.new(rng)
    w_str = _addr_str(w.to_address())
    v_str = _addr_str(val.to_address())
    env.seed_balance(v_str, 10**12)

    # withdrawal address must differ from the validator (on-chain assert)
    with pytest.raises(Exception):
        env.stack.evaluate_function(
            "bond_validator", [v_str, "1000000u64", "10u8"],
            signer=val.to_address(), caller=val.to_address())
    # sub-1-credit amount halts in the on-chain function
    with pytest.raises(Exception):
        env.stack.evaluate_function(
            "bond_validator", [w_str, "999999u64", "10u8"],
            signer=val.to_address(), caller=val.to_address())
    # commission above 100 halts
    with pytest.raises(Exception):
        env.stack.evaluate_function(
            "bond_validator", [w_str, "1000000u64", "101u8"],
            signer=val.to_address(), caller=val.to_address())


def test_delegator_below_minimum_rejected_in_finalize():
    env = Env()
    val = account.PrivateKey.new(rng)
    val_w = account.PrivateKey.new(rng)
    dele = account.PrivateKey.new(rng)
    v_str = _addr_str(val.to_address())
    d_str = _addr_str(dele.to_address())
    env.seed_balance(v_str, 2 * MIN_VALIDATOR_TOTAL)
    env.seed_balance(d_str, 10**12)
    env.run("bond_validator",
            [_addr_str(val_w.to_address()), f"{MIN_VALIDATOR_TOTAL}u64", "0u8"], val)
    # 1 credit passes the on-chain gate but is below the 10k-credit
    # delegator floor enforced in finalize -> rejected
    env.run("bond_public",
            [v_str, d_str, "1000000u64"], dele, expect_accept=False)
