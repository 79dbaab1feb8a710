"""On-device RL adaptive-sampling agents."""

from pinnrl_tpu.rl.dqn import (  # noqa: F401
    CollocationAgent,
    CollocationAgentState,
    DQNNetwork,
    RLAgent,
    RLAgentState,
)
