# deep-mutual-learning runs reuse the parent model config; train with train_dml.py
