"""Environment registry (reference: harl/envs/__init__.py + envs_tools factories)."""
from __future__ import annotations


def make_env(env_name: str, env_args: dict):
    """Construct a pure-JAX env object implementing reset/step + space attrs."""
    if env_name in ("pettingzoo_mpe", "mpe"):
        from harl_tpu.envs.mpe.mpe import make_mpe

        scenario = env_args.get("scenario", "simple_spread")
        # accept reference-style suffixed names, e.g. "simple_spread_v2"
        for suffix in ("_v3", "_v2"):
            if scenario.endswith(suffix):
                scenario = scenario[: -len(suffix)]
        kwargs = {}
        if "max_cycles" in env_args:
            kwargs["max_cycles"] = env_args["max_cycles"]
        if "local_ratio" in env_args:
            kwargs["local_ratio"] = env_args["local_ratio"]
        return make_mpe(
            scenario,
            continuous_actions=env_args.get("continuous_actions", True),
            **kwargs,
        )
    if env_name in ("smaclite", "smac", "smacv2"):
        # smac/smacv2 prefer the REAL StarCraft II binary when its package
        # is installed (backend auto|native, mirroring the mamujoco native
        # engine routing); otherwise the pure-JAX SMACLite analogue runs the
        # same maps. backend=jax forces the analogue.
        backend = env_args.get("backend", "auto")
        if env_name == "smac" and backend in ("auto", "native"):
            try:
                from harl_tpu.envs.smac.smac_env import make_smac

                return make_smac(env_args)
            except ImportError:
                if backend == "native":
                    raise
        if env_name == "smacv2" and backend in ("auto", "native"):
            try:
                from harl_tpu.envs.smacv2.smacv2_env import make_smacv2

                return make_smacv2(env_args)
            except ImportError:
                if backend == "native":
                    raise
        from harl_tpu.envs.smaclite.smaclite import make_smaclite

        kwargs = {}
        for k in ("episode_limit", "state_type", "reward_scale"):
            if k in env_args:
                kwargs[k] = env_args[k]
        return make_smaclite(env_args.get("map_name", "5m_vs_5m"), **kwargs)
    if env_name in ("mamujoco_jax", "manyagent_swimmer"):
        scenario = env_args.get("scenario", "manyagent_swimmer")
        if scenario in ("manyagent_swimmer", "Swimmer-v2"):
            from harl_tpu.envs.mamujoco_jax.swimmer import make_swimmer

            return make_swimmer(env_args)
        if scenario == "coupled_half_cheetah":
            from harl_tpu.envs.mamujoco_jax.coupled import make_coupled

            return make_coupled(env_args)
        if scenario.startswith("Humanoid"):
            from harl_tpu.envs.mamujoco_jax.humanoid import make_humanoid

            return make_humanoid(env_args)
        if scenario.startswith("Reacher"):
            from harl_tpu.envs.mamujoco_jax.reacher import make_reacher

            return make_reacher(env_args)
        if scenario == "manyagent_ant":
            from harl_tpu.envs.mamujoco_jax.manyagent_ant import make_manyagent_ant

            return make_manyagent_ant(env_args)
        if scenario.startswith("Ant"):
            from harl_tpu.envs.mamujoco_jax.ant import make_ant

            return make_ant(env_args)
        from harl_tpu.envs.mamujoco_jax.planar import make_planar

        return make_planar(env_args)
    if env_name == "mamujoco":
        backend = env_args.get("backend", "auto")
        if backend in ("auto", "native"):
            try:
                from harl_tpu.envs.mamujoco.native_vec import make_native_mamujoco

                return make_native_mamujoco(env_args)
            except (ImportError, ValueError, RuntimeError):
                if backend == "native":
                    raise
        from harl_tpu.envs.mamujoco.mamujoco import make_mamujoco

        return make_mamujoco(env_args)
    if env_name == "gym":
        from harl_tpu.envs.gym.gym_env import make_gym

        return make_gym(env_args)
    if env_name in ("football_jax", "soccer"):
        from harl_tpu.envs.football_jax.soccer import make_soccer

        return make_soccer(env_args)
    if env_name == "football":
        from harl_tpu.envs.football.football_env import FootballEnv

        return FootballEnv(env_args)
    if env_name in ("lag_jax", "aircombat"):
        from harl_tpu.envs.lag_jax.aircombat import make_aircombat

        return make_aircombat(env_args)
    if env_name == "lag":
        from harl_tpu.envs.lag.lag_env import LAGEnv

        return LAGEnv(env_args)
    if env_name in ("dexhands", "dexhands_jax"):
        if env_name == "dexhands" and env_args.get("backend", "auto") in (
                "auto", "native"):
            # real IsaacGym bidexhands when available (CUDA-only)
            try:
                from harl_tpu.envs.dexhands.dexhands_env import make_dexhands

                return make_dexhands(env_args)
            except ImportError:
                if env_args.get("backend") == "native":
                    raise
        from harl_tpu.envs.dexhands_jax.manip import MANIP_TASKS

        if env_args.get("task", "ShadowHandOver") in MANIP_TASKS:
            from harl_tpu.envs.dexhands_jax.manip import make_manip

            return make_manip(env_args)
        from harl_tpu.envs.dexhands_jax.handover import make_handover

        return make_handover(env_args)
    raise ValueError(f"Unknown env {env_name!r}")
