"""fit on train graphs / transform test graphs (the sklearn estimator
pattern), with networkx inputs and a C grid search."""

import numpy as np
import networkx as nx
from sklearn.model_selection import train_test_split
from sklearn.svm import SVC

from grakel_tpu import GraphKernel, graph_from_networkx

rng = np.random.RandomState(0)
graphs, y = [], []
for i in range(120):
    G = nx.gnp_random_graph(rng.randint(8, 20), 0.3,
                            seed=int(rng.randint(1 << 30)))
    p = 0.7 if i % 2 else 0.3
    for v in G.nodes:
        G.nodes[v]["label"] = int(rng.rand() < p)
    graphs.append(G)
    y.append(i % 2)

data = list(graph_from_networkx(graphs, node_labels_tag="label"))
train, test, y_tr, y_te = train_test_split(data, y, random_state=0)

gk = GraphKernel(kernel="WL", normalize=True)
K_train = gk.fit_transform(train)
K_test = gk.transform(test)

best = max((SVC(kernel="precomputed", C=C).fit(K_train, y_tr)
            .score(K_test, y_te), C) for C in [0.1, 1, 10, 100])
print("test accuracy %.3f (C=%g)" % best)
