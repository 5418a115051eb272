#!/usr/bin/env python3
"""Autoencoder training driver (reference autoencoder/train.py).

    python tasks/autoencode.py --preset autoencoder --dataroot /path/to/data
"""



from sonet_tpu.config import parse_args
from sonet_tpu.train.trainer import Trainer


def main(argv=None):
    cfg = parse_args(argv, preset="autoencoder")
    trainer = Trainer(cfg)
    # the reference saves every epoch (autoencoder/train.py:106-109);
    # threshold None = save on every improvement
    final = trainer.fit(save_threshold=None, visualize_every=5)
    print({"final": final, "best": trainer.best_metric})
    return final


if __name__ == "__main__":
    main()
