from .runner import Runner
from .checkpoint import save_checkpoint, load_checkpoint
