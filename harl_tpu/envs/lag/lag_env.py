"""Light Aircraft Game (LAG / CloseAirCombat) adapter.

Parity target: ``harl/envs/lag/lag_env.py`` + the vendored JSBSim wrapper.
The JSBSim flight-dynamics engine is an external dependency; this adapter
raises an informative error when it is unavailable. The reference's task
plugin structure (SingleControl / SingleCombat / MultipleCombat with
task/reward/termination plugins, harl/envs/lag/JSBSim/) maps to the
``task`` env_arg here.
"""
from __future__ import annotations


class LAGEnv:
    is_jax = False

    def __init__(self, env_args: dict):
        try:
            import jsbsim  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "LAG/CloseAirCombat requires the `jsbsim` flight-dynamics "
                "engine. Install it to use --env lag; see the reference "
                "adapter harl/envs/lag/lag_env.py."
            ) from e
        raise NotImplementedError(
            "JSBSim present but the LAG task wrapper is not yet ported; "
            "planned for a future round."
        )
