#pragma once
#include "writer.hpp"

namespace Csdr {

    template <typename T>
    class Source {
        public:
            virtual ~Source() = default;
            virtual void setWriter(Writer<T>* writer) { this->writer = writer; }
        protected:
            Writer<T>* writer = nullptr;
    };

}
