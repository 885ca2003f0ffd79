"""Classification example on the bundled Hansen forest-change raster.

Trains the device-resident classifier to predict forest cover from the
raster channels, demonstrating the cube -> design-matrix bridge and the
TPU training path.

Run: python examples/forest_classification.py
"""

import numpy as np

import nd_tpu
from nd_tpu.classify import Classifier, JaxClassifier
from nd_tpu.core import DataArray
from nd_tpu.io import open_netcdf


def main():
    ds = open_netcdf('/root/reference/examples/kalimantan_forest.nc')
    print('loaded:', dict(ds.sizes), list(ds.data_vars))

    # task: predict where forest loss occurred (lossyear > 0) from the
    # year-2000 tree cover and the gain channel
    loss = np.asarray(ds['lossyear'].values, dtype=np.float64)
    labels = DataArray(
        np.where(loss > 0, 2.0, 1.0),
        dims=('y', 'x'),
        coords={'y': ds['y'].values, 'x': ds['x'].values})

    features = ds[['treecover2000', 'gain']].astype(np.float32)

    clf = JaxClassifier(hidden=(16,), epochs=150, lr=0.05)
    pred = clf.fit_predict(features, labels)
    acc = float((np.asarray(pred.values)
                 == np.asarray(labels.values)).mean())
    print('JaxClassifier accuracy: %.3f' % acc)

    try:
        from sklearn.linear_model import LogisticRegression
        skl = Classifier(LogisticRegression(max_iter=300))
        pred2 = skl.fit(features, labels).predict(features)
        acc2 = float((np.asarray(pred2.values)
                      == np.asarray(labels.values)).mean())
        print('sklearn LogisticRegression accuracy: %.3f' % acc2)
    except ImportError:
        pass
    return pred


if __name__ == '__main__':
    main()
