"""Algorithm registry (reference: harl/algorithms/actors/__init__.py)."""
from harl_tpu.algos.happo import HAA2CActor, HAPPOActor, MAPPOActor
from harl_tpu.algos.hatrpo import HATRPOActor

# actor class + whether the runner chains the sequential-update factor
ON_POLICY_REGISTRY = {
    "happo": (HAPPOActor, True),
    "haa2c": (HAA2CActor, True),
    "hatrpo": (HATRPOActor, True),
    "mappo": (MAPPOActor, False),
}
