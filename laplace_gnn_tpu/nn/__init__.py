from .module import (ACTIVATIONS, BatchNorm, CNN, Conv2d, DictInputModel,
                     Identity, LayerNorm, Linear, MLP, TapCollector,
                     activation_resolver, dropout, get_subtree, make_norm,
                     set_subtree)
