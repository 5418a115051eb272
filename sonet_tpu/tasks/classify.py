#!/usr/bin/env python3
"""Classification training driver (reference modelnet/train.py,
shrec16/train.py and the missing-in-reference MNIST task).

    python tasks/classify.py --preset modelnet40 --dataroot /path/to/data
    python tasks/classify.py --preset mnist --dataroot /path/to/mnist
    python tasks/classify.py --preset tiny_test --dataset synthetic
"""



from sonet_tpu.config import parse_args
from sonet_tpu.train.trainer import Trainer


def main(argv=None):
    cfg = parse_args(argv, preset="modelnet40")
    # ModelNet10/40 automation (modelnet/train.py:36-37,106-109)
    if cfg.dataset == "modelnet" and cfg.classes == 10:
        cfg = cfg.replace(dropout=min(cfg.dropout + 0.1, 0.99),
                          lr_decay_step=40)
    # checkpoint-save thresholds (modelnet/train.py:96-99)
    threshold = None
    if cfg.dataset == "modelnet":
        threshold = 0.930 if cfg.classes == 10 else 0.918
    trainer = Trainer(cfg)
    final = trainer.fit(save_threshold=threshold)
    print({"final": final, "best": trainer.best_metric})
    return final


if __name__ == "__main__":
    main()
