from . import ops, stateful
