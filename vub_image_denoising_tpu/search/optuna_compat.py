"""Optuna-compatible search engine.

The reference drives hyperparameter search with optuna
(diffusion_denoising/hyperparams_search.py:93-94 and the pruning-aware GAN trainer in
__pycache__/train_denoising_gan_hyperparameters.pyc).  Optuna is not installed in this
environment, so this module provides a drop-in subset: ``create_study`` returns real
optuna when importable, else a built-in engine with the same Trial/Study API
(suggest_categorical / suggest_float(log=) / suggest_int, trial.report +
should_prune with median pruning, study.best_trial / best_params / trials).

The fallback sampler is random search seeded per trial — adequate for the reference's
50-trial studies and fully deterministic under a fixed seed.
"""

import math
import random
from typing import Any, Callable, Dict, List, Optional


class TrialPruned(Exception):
    """Raised inside an objective to signal a pruned trial (optuna.TrialPruned)."""


class _Trial:
    def __init__(self, number: int, seed: int, study: "_Study"):
        self.number = number
        self._rng = random.Random(seed * 9973 + number)
        self._study = study
        self.params: Dict[str, Any] = {}
        self.intermediate: Dict[int, float] = {}
        self.value: Optional[float] = None
        self.state = "RUNNING"
        self.user_attrs: Dict[str, Any] = {}

    # --- suggest API ---
    def suggest_categorical(self, name, choices):
        v = self._rng.choice(list(choices))
        self.params[name] = v
        return v

    def suggest_float(self, name, low, high, log=False, step=None):
        if log:
            v = math.exp(self._rng.uniform(math.log(low), math.log(high)))
        elif step:
            n = int((high - low) / step)
            v = low + step * self._rng.randint(0, n)
        else:
            v = self._rng.uniform(low, high)
        self.params[name] = v
        return v

    # optuna's deprecated spellings used by older code
    def suggest_loguniform(self, name, low, high):
        return self.suggest_float(name, low, high, log=True)

    def suggest_uniform(self, name, low, high):
        return self.suggest_float(name, low, high)

    def suggest_int(self, name, low, high, step=1):
        v = self._rng.randrange(low, high + 1, step)
        self.params[name] = v
        return v

    # --- pruning API ---
    def report(self, value, step):
        self.intermediate[step] = float(value)

    def should_prune(self) -> bool:
        """Median pruner: prune if the latest intermediate value is worse than the
        median of completed trials' values at the same step (>=1 completed trial)."""
        if not self.intermediate:
            return False
        step = max(self.intermediate)
        peers = [
            t.intermediate[step]
            for t in self._study.trials
            if t.state == "COMPLETE" and step in t.intermediate
        ]
        if not peers:
            return False
        peers.sort()
        median = peers[len(peers) // 2]
        mine = self.intermediate[step]
        return mine > median if self._study.direction == "minimize" else mine < median

    def set_user_attr(self, key, value):
        self.user_attrs[key] = value


class _Study:
    def __init__(self, direction="minimize", seed=0):
        self.direction = direction
        self.seed = seed
        self.trials: List[_Trial] = []

    def optimize(self, objective: Callable, n_trials: int, callbacks=None):
        for i in range(n_trials):
            trial = _Trial(i, self.seed, self)
            self.trials.append(trial)
            try:
                trial.value = float(objective(trial))
                trial.state = "COMPLETE"
            except TrialPruned:
                trial.state = "PRUNED"
            for cb in callbacks or []:
                cb(self, trial)

    @property
    def best_trial(self) -> _Trial:
        done = [t for t in self.trials if t.state == "COMPLETE"]
        if not done:
            raise ValueError("no completed trials")
        key = (lambda t: t.value) if self.direction == "minimize" else (lambda t: -t.value)
        return min(done, key=key)

    @property
    def best_params(self):
        return self.best_trial.params

    @property
    def best_value(self):
        return self.best_trial.value


def create_study(direction: str = "minimize", seed: int = 0, prefer_optuna: bool = True):
    """Real optuna study when available, else the built-in engine."""
    if prefer_optuna:
        try:
            import optuna

            return optuna.create_study(direction=direction)
        except ImportError:
            pass
    return _Study(direction=direction, seed=seed)
