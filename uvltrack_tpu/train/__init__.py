from . import actor, checkpoint, losses, optim, step, trainer

__all__ = ["actor", "checkpoint", "losses", "optim", "step", "trainer"]
