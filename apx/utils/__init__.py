from .checkpoint import restore_state, save_state
