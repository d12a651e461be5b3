"""freeze_norms_at phase switching (reference FreezableModel capability)."""

import jax


def test_trainer_phase_switch():
    from raygun_tpu.train.loop import Trainer

    calls = []

    def fn_a(state, key):
        calls.append("a")
        return state, {"loss": 0.0}

    def fn_b(state, key):
        calls.append("b")
        return state, {"loss": 0.0}

    t = Trainer(
        step_fn=fn_a, state={}, step_fn_phases={3: fn_b}, num_epochs=6,
        log_every=100, save_every=0, checkpoint_basename="/tmp/nonexistent/x",
    )
    t.train(start_iteration=0)
    assert calls == ["a", "a", "a", "b", "b", "b"]
