/* Minimal exact-1-NN stand-in for libflann (not installed in this
 * image), API-compatible with the subset the reference RANSAC matchers
 * use (RandomNormalMatching.cpp:40-65,287-306): Matrix<T>,
 * Index<L2<double>> with buildIndex()/knnSearch().  The reference
 * builds a KDTreeSingleIndex and queries with SearchParams(-1, 0.0) =
 * EXACT search, so a brute-force linear scan returns identical
 * neighbors (first-minimum tie-break = lowest index, the same order
 * the kd-tree's dataset was filled in).  Points are deep-copied at
 * construction: the reference deallocates its buffer right after
 * buildIndex (RandomNormalMatching.cpp:64).
 */
#pragma once
#include <cstddef>

namespace flann
{

template <typename T> struct Matrix
{
  T*     data;
  size_t rows, cols;
  Matrix() : data(0), rows(0), cols(0) {}
  Matrix(T* d, size_t r, size_t c) : data(d), rows(r), cols(c) {}
  T* operator[](size_t i) const { return data + i * cols; }
  T* ptr() const { return data; }
};

struct KDTreeSingleIndexParams
{
  KDTreeSingleIndexParams(int leaf_max_size = 10) { (void)leaf_max_size; }
};

struct SearchParams
{
  SearchParams(int checks = 32, float eps = 0.0f)
  {
    (void)checks;
    (void)eps;
  }
};

template <typename T> struct L2
{
  typedef T ElementType;
};

template <typename Dist> class Index
{
public:
  typedef typename Dist::ElementType T;

  Index(const Matrix<T>& m, const KDTreeSingleIndexParams&)
      : _rows(m.rows), _cols(m.cols), _data(new T[m.rows * m.cols])
  {
    for(size_t i = 0; i < m.rows * m.cols; i++)
      _data[i] = m.data[i];
  }
  ~Index() { delete[] _data; }

  void buildIndex() {}

  int knnSearch(const Matrix<T>& q, Matrix<int>& idx, Matrix<T>& dist,
                int knn, const SearchParams&)
  {
    (void)knn; /* the matchers only ever ask for 1 */
    for(size_t r = 0; r < q.rows; r++)
    {
      T   best = (T)1e300;
      int bi   = 0;
      for(size_t i = 0; i < _rows; i++)
      {
        T d = (T)0;
        for(size_t c = 0; c < _cols; c++)
        {
          const T diff = _data[i * _cols + c] - q[r][c];
          d += diff * diff;
        }
        if(d < best)
        {
          best = d;
          bi   = (int)i;
        }
      }
      idx[r][0]  = bi;
      dist[r][0] = best; /* flann L2 returns SQUARED distance */
    }
    return 1;
  }

private:
  size_t _rows, _cols;
  T*     _data;
};

} /* namespace flann */
