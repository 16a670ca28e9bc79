"""ledger/test-helpers analog: the sample fixtures build real objects."""
import random

from snarkvm_tpu.ledger import test_helpers as TH
from snarkvm_tpu.snark.poly import sample_element_outside_domain, evaluate_vanishing


def test_sample_fixtures():
    led, keys = TH.sample_genesis_ledger()
    p = TH.sample_execution_transaction(led, keys)
    assert p.transaction.kind == "execute"
    assert p.transaction.fee_amount > 0
    t = TH.sample_transition(led, keys)
    assert t.program_id == "credits.aleo"
    rej = TH.sample_rejected_execution(led, keys)
    accepted, rejected, aborted = led.vm.speculate([p, rej])
    led.vm.abort_speculation()
    assert accepted == [0] and rejected == [1]
    d = TH.sample_deployment_transaction(led, keys)
    assert d.transaction.kind == "deploy"
    assert d.transaction.owner.verify(d.deployment.to_deployment_id())
    sol, puzzle = TH.sample_solution(led)
    assert puzzle.check_solution(sol, led.latest_epoch_hash(), 1)


def test_sample_element_outside_domain():
    rng = random.Random(1)
    for n in (8, 64):
        for _ in range(5):
            v = sample_element_outside_domain(n, rng)
            assert evaluate_vanishing(n, v) != 0
