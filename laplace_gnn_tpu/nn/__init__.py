from .module import (ACTIVATIONS, BatchNorm, Identity, LayerNorm, Linear, MLP,
                     TapCollector, activation_resolver, dropout, get_subtree,
                     make_norm, set_subtree)
